"""Test configuration lives in the repo-root conftest.py (it must run
before any plugin-triggered jax backend initialization)."""
