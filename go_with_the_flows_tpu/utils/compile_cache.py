"""Persistent XLA compilation cache for the CLI entry points.

The flagship training step compiles in minutes on TPU (and tens of
minutes on the 1-core CPU host), and the reference's staged-lr recipes
(scripts/train_*.sh) chain several train/eval invocations — without a
persistent cache every stage re-pays every compile. All CLIs call
`enable_compilation_cache()` right after importing jax; warm stages
then load their executables from disk.

Cache location: `$GWTF_COMPILE_CACHE` if set, else `.jax_cache/` next to
the repo root (shared with bench.py / __graft_entry__.py, which
configure the same directory).
"""

from __future__ import annotations

import os

import jax

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compilation_cache(path: str | None = None) -> str:
    """Point jax's persistent compilation cache at `path` (see module
    docstring for the default) and return the directory used."""
    cache_dir = path or os.environ.get("GWTF_COMPILE_CACHE", _DEFAULT)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # only persist compilations that are actually expensive
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    return cache_dir


def require_backend() -> None:
    """Fail fast when `GWTF_REQUIRE_BACKEND` is set and jax resolved a
    different backend.

    A flaky TPU runtime can fail libtpu init, after which jax silently
    selects the CPU backend and a flagship training epoch takes minutes
    of host compute instead of sub-second device steps. Orchestration
    that expects an accelerator sets GWTF_REQUIRE_BACKEND=tpu and
    retries the invocation instead of burning hours on the fallback.
    """
    want = os.environ.get("GWTF_REQUIRE_BACKEND")
    if want and jax.default_backend() != want:
        raise SystemExit(
            f"GWTF_REQUIRE_BACKEND={want} but jax selected "
            f"'{jax.default_backend()}' — accelerator runtime not "
            "available; retry when it is (or unset the variable)."
        )
