"""Mixture-of-flows point cloud VAE — the flagship model family.

TPU-first re-design of the reference's `lib/networks/models.py`
(Local_Cond_RNVP_MC_Global_RNVP_VAE) + `lib/networks/flow_mixture.py`
(Flow_Mixture_Model / Flow_Mixture_SVR_Model):

  * The K mixture components are ONE `nn.vmap`-lifted decoder over stacked
    parameters — a single fused XLA computation instead of the reference's
    Python loop over K modules (flow_mixture.py:162-166).
  * Sampling replaces the reference's host-side `np.random.choice` component
    assignment + ragged per-component decode (flow_mixture.py:149-177) with a
    jit-friendly static formulation: per-point component ids via
    `jax.random.categorical`, all K components decode all N points, and the
    output cloud is gathered by id. K<=4, so this costs <=4x decode compute
    on the sampling path and removes every device->host sync; it also lifts
    the reference's batch-size-1 eval restriction (flow_mixture.py:146).
  * Losses consume accumulated log-variance sums, not per-layer lists.

Modes (reference `util_mode`): 'training', 'autoencoding', 'generating',
'reconstruction' (SVR).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .flows import (
    LatentPriorFlow,
    PointDecoderFlow,
    ScanPointDecoderFlow,
    point_decoder_param_count,
)
from .encoders import PointNetCloudEncoder, FeatureEncoder, WeightsEncoder
from .resnet import ResNet18


def reduce_decoder_params(
    n_components: int,
    params_reduce_mode: str,
    p_decoder_n_flows: int,
    p_decoder_n_features: int,
    g_latent_space_size: int,
) -> Tuple[int, int]:
    """Per-component decoder depth/width so that K small decoders fit the
    parameter budget of one full-size decoder.

    Exact port of the arithmetic in reference flow_mixture.py:44-102
    (`_get_decoder_params` / `_get_p_decoder_n_features`): modes `none`,
    `depth_first` (depth = ceil(F/K)), `depth_and_feature`
    (depth = ceil(F/sqrt(K))), `feature_first`; feature width is shrunk
    until K * params(small) <= params(big), floor 4 features.
    """
    n = n_components
    count = point_decoder_param_count
    big = count(p_decoder_n_flows, p_decoder_n_features, g_latent_space_size)

    def shrink_features(depth):
        f = p_decoder_n_features
        total = big * n
        while total > big and f > 4:
            f -= 1
            total = count(depth, f, g_latent_space_size) * n
        return f, (total > big, big, total)

    if n == 1 or params_reduce_mode == "none":
        return p_decoder_n_flows, p_decoder_n_features
    if params_reduce_mode == "depth_and_feature":
        depth = math.ceil(p_decoder_n_flows / math.sqrt(n))
        feats, _ = shrink_features(depth)
    elif params_reduce_mode == "depth_first":
        depth = math.ceil(p_decoder_n_flows / n)
        feats, _ = shrink_features(depth)
    elif params_reduce_mode == "feature_first":
        depth = p_decoder_n_flows
        feats, (over, big_, total) = shrink_features(depth)
        if over:
            while total > big_:
                depth -= 1
                total = count(depth, feats, g_latent_space_size) * n
    else:
        raise ValueError(f"Unknown params_reduce_mode: {params_reduce_mode}")
    return depth, feats


def _reparameterize(rng, mu, logvar):
    """Gaussian reparameterization (reference models.py:99-109)."""
    std = jnp.exp(0.5 * logvar)
    return mu + std * jax.random.normal(rng, mu.shape, mu.dtype)


class FlowMixtureModel(nn.Module):
    """Mixture of K conditional RealNVP decoder flows under a flow-prior VAE.

    Config fields mirror the reference YAML keys (configs/*.yaml).
    """

    n_components: int
    params_reduce_mode: str = "depth_and_feature"
    weights_type: str = "learned_weights"

    g_latent_space_size: int = 128
    g_prior_n_flows: int = 7
    g_prior_n_features: int = 128
    g_posterior_n_layers: int = 1

    p_latent_space_size: int = 3
    p_prior_n_layers: int = 1
    p_decoder_n_flows: int = 21
    p_decoder_n_features: int = 64
    p_decoder_base_type: str = "free"  # free | freevar | fixed
    p_decoder_base_var: float = -3.9551

    pc_enc_init_n_features: int = 64
    pc_enc_n_features: Sequence[int] = (128, 256, 512)
    remat_couplings: bool = False  # rematerialize unrolled couplings
    # lax.scan over coupling pattern periods (with a remat'd body):
    # measured 2.5x faster training steps and ~3x faster compiles at
    # flagship scale, numerically identical (tests/test_scan_decoder.py).
    # Param layout differs from the unrolled stack — convert checkpoints
    # with flows.unrolled_to_scanned_params. Set False for the reference-
    # shaped per-layer layout.
    scan_couplings: bool = True
    # Fused Pallas sampling kernel for eval-mode direct decode:
    # None = auto (TPU only), True = always (interpret off-TPU, tests),
    # False = XLA. See _decode_direct_eval.
    fused_sampling: bool | None = None
    # (A sparse component-partitioned sampling decode — each point
    # through only its own component's flow — was built, validated for
    # distribution equivalence, measured 2.8x SLOWER than the dense
    # fused kernel on real v5e, and RETIRED in round 4; spec + numbers
    # in ROADMAP.md, code at git 25c629e.)

    def setup(self):
        G = self.g_latent_space_size
        self.pc_encoder = PointNetCloudEncoder(
            self.pc_enc_init_n_features, tuple(self.pc_enc_n_features)
        )

        # Learned base prior over g (reference models.py:66-70).
        self.g0_prior_mus = self.param(
            "g0_prior_mus", nn.initializers.normal(0.033), (1, G)
        )
        self.g0_prior_logvars = self.param(
            "g0_prior_logvars", nn.initializers.normal(0.33), (1, G)
        )

        self.g_prior = LatentPriorFlow(
            n_flows=self.g_prior_n_flows,
            n_features=self.g_prior_n_features,
            g_features=G,
            weight_std=0.01,
        )
        self.g_posterior = FeatureEncoder(
            n_layers=self.g_posterior_n_layers,
            latent_space_size=G,
            deterministic=False,
            mu_weight_std=0.0033,
            mu_bias=0.0,
            logvar_weight_std=0.033,
            logvar_bias=0.0,
        )

        # Point base prior, shared across mixture components
        # (reference models.py:80-92; the mixture reuses the single
        # p_prior). The reference's decode loop calls it once PER
        # component (flow_mixture.py:163-167) — K same-batch BN updates
        # per step — while we call it once, so its BN momentum is 0.9^K
        # for bit-equal running-stat dynamics.
        p_prior_momentum = 0.9 ** self.n_components
        if self.p_decoder_base_type == "free":
            self.p_prior = FeatureEncoder(
                n_layers=self.p_prior_n_layers,
                latent_space_size=self.p_latent_space_size,
                deterministic=False,
                mu_weight_std=0.001,
                mu_bias=0.0,
                logvar_weight_std=0.01,
                logvar_bias=0.0,
                bn_momentum=p_prior_momentum,
            )
        elif self.p_decoder_base_type == "freevar":
            self.p_prior = FeatureEncoder(
                n_layers=self.p_prior_n_layers,
                latent_space_size=self.p_latent_space_size,
                deterministic=True,
                mu_weight_std=0.01,
                mu_bias=0.0,
                bn_momentum=p_prior_momentum,
            )
        elif self.p_decoder_base_type != "fixed":
            raise ValueError(
                f"Unknown p_decoder_base_type: {self.p_decoder_base_type}"
            )

        depth, feats = reduce_decoder_params(
            self.n_components,
            self.params_reduce_mode,
            self.p_decoder_n_flows,
            self.p_decoder_n_features,
            self.g_latent_space_size,
        )
        self.pc_decoder_depth = depth
        self.pc_decoder_features = feats
        # K components as one vmapped decoder over a stacked param pytree.
        decoder_cls = (
            ScanPointDecoderFlow if self.scan_couplings else PointDecoderFlow
        )
        VmappedDecoder = nn.vmap(
            decoder_cls,
            in_axes=(0, None, None, None),
            out_axes=0,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True},
            axis_size=self.n_components,
        )
        decoder_kwargs = dict(
            n_flows=depth, f_features=feats, g_features=G, weight_std=0.01,
        )
        if not self.scan_couplings:
            decoder_kwargs["remat"] = self.remat_couplings
        self.pc_decoder = VmappedDecoder(
            **decoder_kwargs, name="pc_decoder"
        )

        # Global mixture logits (reference flow_mixture.py:32).
        self.mixture_weights_logits = self.param(
            "mixture_weights_logits",
            nn.initializers.zeros_init(),
            (self.n_components,),
        )
        self.mixture_weights_encoder = WeightsEncoder(
            n_layers=3,
            n_components=self.n_components,
            mu_weight_std=0.001,
            mu_bias=0.0,
        )

    # ------------------------------------------------------------------ #
    # encode                                                             #
    # ------------------------------------------------------------------ #

    def _posterior(self, g_input, train):
        """PointNet -> max-pool over points -> posterior heads
        (reference models.py:127-131)."""
        feats = self.pc_encoder(g_input, train=train)
        pooled = jnp.max(feats, axis=2)
        return self.g_posterior(pooled, train=train)

    def encode(self, g_input, mode: str, train: bool | None = None):
        """Prior-flow encoding (reference models.py:111-151).

        training/autoencoding: posterior sample (resp. mean) is inverted
        through the prior flow; generating: the learned base prior is
        sampled and pushed forward.
        `train` controls BatchNorm batch-vs-running statistics; it defaults
        to (mode == 'training') but can be forced off for the validation
        loss, which runs the training path under model.eval() in the
        reference (training.py:110-118).
        """
        if train is None:
            train = mode == "training"
        B = g_input.shape[0]
        mu0 = jnp.broadcast_to(self.g0_prior_mus, (B, self.g_latent_space_size))
        lv0 = jnp.broadcast_to(
            self.g0_prior_logvars, (B, self.g_latent_space_size)
        )
        out = {"g_prior_mus0": mu0, "g_prior_logvars0": lv0}

        if mode in ("training", "autoencoding"):
            post_mus, post_logvars = self._posterior(g_input, train)
            out["g_posterior_mus"] = post_mus
            out["g_posterior_logvars"] = post_logvars
            if mode == "training":
                g_s = _reparameterize(
                    self.make_rng("sample"), post_mus, post_logvars
                )
            else:
                g_s = post_mus
            g0, flow_lv_sum = self.g_prior(g_s, "inverse", train)
            out["g0_sample"] = g0
            out["g_sample"] = g_s
        elif mode == "generating":
            g0 = _reparameterize(self.make_rng("sample"), mu0, lv0)
            g_s, flow_lv_sum = self.g_prior(g0, "direct", train)
            out["g0_sample"] = g0
            out["g_sample"] = g_s
        else:
            raise ValueError(f"encode: unsupported mode {mode}")

        out["g_prior_logvar_sum"] = lv0 + flow_lv_sum
        return out

    # ------------------------------------------------------------------ #
    # decode                                                             #
    # ------------------------------------------------------------------ #

    def _point_base(self, g_sample, train):
        """Base distribution of the point flow, shared across components
        (reference models.py:169-193). Returns (mus, logvars) of shape
        (B, 3, 1), broadcastable over points."""
        B = g_sample.shape[0]
        C = self.p_latent_space_size
        if self.p_decoder_base_type == "free":
            mus, logvars = self.p_prior(g_sample, train=train)
            return mus[:, :, None], logvars[:, :, None]
        if self.p_decoder_base_type == "freevar":
            logvars = self.p_prior(g_sample, train=train)
            return jnp.zeros((B, C, 1), g_sample.dtype), logvars[:, :, None]
        # fixed
        mus = jnp.zeros((B, C, 1), g_sample.dtype)
        logvars = jnp.full((B, C, 1), self.p_decoder_base_var, g_sample.dtype)
        return mus, logvars

    def get_weights(self, g_sample, warmup: bool, train: bool):
        """Mixture log-weights (reference flow_mixture.py:104-120): global
        logits during warmup / global_weights, else the weights encoder.

        The encoder is always invoked so its parameters exist regardless of
        weights_type (torch instantiates every module unconditionally,
        flow_mixture.py:39-42; checkpoints stay interchangeable between
        weight modes). The unused branch gets zero gradients, which the
        optimizer skips — the find_unused_parameters analog.
        """
        if self.weights_type not in ("global_weights", "learned_weights"):
            raise ValueError(f"Unknown weights_type: {self.weights_type}")
        B = g_sample.shape[0]
        use_global = warmup or self.weights_type == "global_weights"
        # when the learned branch is unused, run the encoder in inference
        # mode so its BN running stats do not drift (torch never calls it)
        learned = self.mixture_weights_encoder(
            g_sample, train=train and not use_global
        )
        if use_global:
            return jnp.broadcast_to(
                self.mixture_weights_logits[None, :], (B, self.n_components)
            )
        return learned

    def decode_training(self, p_input, g_sample, warmup: bool,
                        train: bool = True, skip_decoder: bool = False):
        """Inverse-decode p_input through ALL K components at once.
        Reference flow_mixture.py:142-143 + models.py:195-198, vectorized.

        `skip_decoder=True` omits the pc_decoder inverse (returning the
        dict without p0_samples/p_logvar_sums): the fused TRAINING kernel
        (ops/pallas/train_kernel.py) runs it outside `apply` so the
        kernel-computed BatchNorm batch statistics can be written back
        into the batch_stats collection at the train-step level — flax
        modules can only mutate their own scope (see train/step.py).
        """
        K = self.n_components
        p_stack = jnp.broadcast_to(p_input[None], (K,) + p_input.shape)
        if skip_decoder:
            base_mus, base_logvars = self._point_base(g_sample, train)
            logits = self.get_weights(g_sample, warmup, train)
            return {
                "p_base_mus": base_mus,
                "p_base_logvars": base_logvars,
                "mixture_weights_logits": logits,
            }
        if train:
            p0, lv_sums = self.pc_decoder(p_stack, g_sample, "inverse",
                                          train)
        else:
            # validation / eval-mode inverse (BN running stats): fusable
            # exactly like sampling — no gradients flow here
            fused = self._fused_eval_decode(p_stack, g_sample,
                                            inverse=True)
            if fused is None:
                p0, lv_sums = self.pc_decoder(p_stack, g_sample,
                                              "inverse", train)
            else:
                p0, lv_sums = fused
        base_mus, base_logvars = self._point_base(g_sample, train)
        logits = self.get_weights(g_sample, warmup, train)
        return {
            "p0_samples": p0,  # (K, B, 3, N)
            "p_logvar_sums": lv_sums,  # (K, B, 3, N)
            "p_base_mus": base_mus,  # (B, 3, 1)
            "p_base_logvars": base_logvars,  # (B, 3, 1)
            "mixture_weights_logits": logits,  # (B, K)
        }

    def decode_sampling(
        self, g_sample, n_sampled_points: int, warmup: bool = False
    ):
        """Sample a labeled cloud from the mixture.

        Static-shape reformulation of reference flow_mixture.py:144-177:
        categorical per-point component ids; all K components decode all N
        points from their own base samples; gather by id. Labels are t+1
        (flow_mixture.py:176).
        """
        K = self.n_components
        B = g_sample.shape[0]
        N = n_sampled_points
        C = self.p_latent_space_size
        logits = self.get_weights(g_sample, warmup, False)

        ids = jax.random.categorical(
            self.make_rng("sample"), logits[:, None, :], axis=-1, shape=(B, N)
        )  # (B, N)

        base_mus, base_logvars = self._point_base(g_sample, False)
        std = jnp.exp(0.5 * base_logvars)  # (B, 3, 1)
        eps = jax.random.normal(
            self.make_rng("sample"), (K, B, C, N), g_sample.dtype
        )
        base = base_mus[None] + std[None] * eps  # (K, B, 3, N)

        decoded = self._decode_direct_eval(base, g_sample)
        # select: out[b, :, n] = decoded[ids[b, n], b, :, n]. A one-hot
        # select-sum, NOT take_along_axis: XLA lowers the K-axis gather
        # to a ~60 ms kernel at flagship scale, the masked sum is a
        # ~1 ms memory-bound sweep.
        mask = ids[None, :, None, :] == jnp.arange(K)[:, None, None, None]
        samples = jnp.sum(jnp.where(mask, decoded, 0.0), axis=0)
        labels = ids + 1
        return samples, labels, logits

    def _packed_eval_decoder(self):
        """Constant-folded per-component decoder weights for the eval
        Pallas kernels (None while params are absent during init)."""
        dec_vars = self.pc_decoder.variables
        if not dec_vars.get("params"):
            return None
        from ..ops.pallas.coupling_kernel import pack_point_decoder

        depth = self.pc_decoder_depth
        scan = self.scan_couplings
        return jax.vmap(
            lambda pr, st: pack_point_decoder(pr, st, depth, scan)
        )(dec_vars["params"], dec_vars["batch_stats"])

    def _fused_eval_decode(self, p_stack, g_sample, inverse: bool):
        """Eval-mode decode of all K components through the fused Pallas
        coupling kernel (ops/pallas/coupling_kernel.py): the whole chain
        stays in VMEM — measured 1.1x (fp32-highest) to 2.9x ('fast'
        matmul precision) faster than the XLA stack at flagship scale.
        Valid only with BN running stats and without gradients (sampling,
        reconstruction, validation loss). Returns (decoded, logvar_sums)
        or None when disabled. The `fused_sampling` attr: None = auto
        (TPU only), True = always (interpret mode off-TPU — for tests),
        False = XLA path."""
        use_fused = self.fused_sampling
        if use_fused is None:
            # auto: respect a jax.default_device(...) override (e.g. the
            # drift audit's CPU control run on a TPU host), else backend
            default_dev = jax.config.jax_default_device
            platform = (default_dev.platform if default_dev is not None
                        else jax.default_backend())
            use_fused = platform == "tpu"
        if not use_fused:
            return None

        # pallas_call has no GSPMD partitioning rule: under a >1-device
        # mesh (evaluate_ae.py wraps everything in jax.set_mesh) the
        # kernel must be wrapped in shard_map over the 'data' axis so
        # each device runs it on its own batch shard — otherwise XLA
        # would all-gather the global batch through one device's kernel,
        # losing the data parallelism the multi-host eval path provides.
        mesh = jax.sharding.get_abstract_mesh()
        shard_data = not mesh.empty and mesh.size > 1
        if shard_data:
            if ("data" not in mesh.axis_names
                    or mesh.size != mesh.shape.get("data", 0)):
                # batch sharded over an unknown layout (e.g. a real
                # 'points' axis): the XLA path partitions any spec
                return None

        from ..ops.pallas.coupling_kernel import (
            film_alpha_beta,
            fused_point_decode,
        )

        packed = self._packed_eval_decoder()
        if packed is None:  # absent during model.init
            return None
        ab = jax.vmap(film_alpha_beta, in_axes=(0, None))(
            packed, g_sample
        )
        decode = functools.partial(
            fused_point_decode,
            interpret=jax.default_backend() != "tpu",
            inverse=inverse,
        )
        if shard_data:
            from jax.sharding import PartitionSpec as P

            bspec = P(None, "data")  # (K, B, ...) batch axis
            # check_vma=False: pallas_call out_shapes carry no
            # varying-mesh-axes annotation, and the kernel is per-shard
            # pointwise over the batch anyway
            decode = jax.shard_map(
                decode, mesh=mesh,
                in_specs=(jax.tree.map(lambda _: P(), packed), bspec,
                          bspec),
                out_specs=(bspec, bspec),
                check_vma=False,
            )
        return decode(packed, ab, p_stack)

    def _decode_direct_eval(self, base, g_sample):
        """Direct eval-mode decode (the sampling hot path)."""
        fused = self._fused_eval_decode(base, g_sample, inverse=False)
        if fused is not None:
            return fused[0]
        decoded, _ = self.pc_decoder(base, g_sample, "direct", False)
        return decoded

    # ------------------------------------------------------------------ #
    # forward                                                            #
    # ------------------------------------------------------------------ #

    def __call__(
        self,
        g_input,
        p_input=None,
        images=None,
        n_sampled_points: Optional[int] = None,
        warmup: bool = False,
        mode: str = "training",
        train: bool | None = None,
        skip_decoder: bool = False,
    ):
        """Dispatch mirroring reference models.py:224-258.

        training       -> dict of encoder+decoder outputs for the loss
        autoencoding / generating / reconstruction
                       -> (encoder_out, samples, labels, logits)
        `train=False` with mode='training' reproduces the reference's
        validation loss (training path under model.eval()).
        `skip_decoder` (training only): see decode_training.
        """
        if train is None:
            train = mode == "training"
        out_enc = self.encode(g_input, mode, train=train)
        g_s = out_enc["g_sample"]
        if mode == "training":
            out_dec = self.decode_training(p_input, g_s, warmup, train,
                                           skip_decoder)
            return {**out_enc, **out_dec}
        if n_sampled_points is None:
            n_sampled_points = p_input.shape[2] if p_input is not None else 2048
        samples, labels, logits = self.decode_sampling(
            g_s, n_sampled_points, warmup
        )
        return out_enc, samples, labels, logits


class FlowMixtureSVRModel(FlowMixtureModel):
    """Single-view-reconstruction variant: the latent prior's base comes
    from a ResNet-18 image encoder (reference flow_mixture.py:181-230).

    Extra config: g_prior_n_layers (head MLP depth, reference :191-195).
    """

    g_prior_n_layers: int = 1

    def setup(self):
        super().setup()
        G = self.g_latent_space_size
        self.img_encoder = ResNet18(num_classes=G)
        self.g0_prior = FeatureEncoder(
            n_layers=self.g_prior_n_layers,
            latent_space_size=G,
            deterministic=False,
            mu_weight_std=0.0033,
            mu_bias=0.0,
            logvar_weight_std=0.033,
            logvar_bias=0.0,
        )

    def encode(self, g_input, mode: str, train: bool | None = None,
               images=None):
        """Reference flow_mixture.py:198-230: image features give the prior
        base; training additionally inverts the point-cloud posterior
        through the prior flow; reconstruction starts from the image-prior
        mean and runs the flow forward."""
        if images is None:
            raise ValueError("SVR encode requires images")
        if train is None:
            train = mode == "training"
        img_features = self.img_encoder(images, train=train)
        mu0, lv0 = self.g0_prior(img_features, train=train)
        out = {"g_prior_mus0": mu0, "g_prior_logvars0": lv0}

        if mode == "training":
            post_mus, post_logvars = self._posterior(g_input, train)
            out["g_posterior_mus"] = post_mus
            out["g_posterior_logvars"] = post_logvars
            g_s = _reparameterize(
                self.make_rng("sample"), post_mus, post_logvars
            )
            g0, flow_lv_sum = self.g_prior(g_s, "inverse", train)
            out["g0_sample"] = g0
            out["g_sample"] = g_s
        elif mode == "reconstruction":
            g0 = mu0
            g_s, flow_lv_sum = self.g_prior(g0, "direct", train)
            out["g0_sample"] = g0
            out["g_sample"] = g_s
        else:
            raise ValueError(f"SVR encode: unsupported mode {mode}")
        out["g_prior_logvar_sum"] = lv0 + flow_lv_sum
        return out

    def __call__(
        self,
        g_input,
        p_input=None,
        images=None,
        n_sampled_points: Optional[int] = None,
        warmup: bool = False,
        mode: str = "training",
        train: bool | None = None,
        skip_decoder: bool = False,
    ):
        if train is None:
            train = mode == "training"
        out_enc = self.encode(g_input, mode, train=train, images=images)
        g_s = out_enc["g_sample"]
        if mode == "training":
            out_dec = self.decode_training(p_input, g_s, warmup, train,
                                           skip_decoder)
            return {**out_enc, **out_dec}
        if n_sampled_points is None:
            n_sampled_points = p_input.shape[2] if p_input is not None else 2500
        samples, labels, logits = self.decode_sampling(
            g_s, n_sampled_points, warmup
        )
        return out_enc, samples, labels, logits
