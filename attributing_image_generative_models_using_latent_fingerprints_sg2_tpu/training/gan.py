"""StyleGAN2 training, TPU-native.

Beyond-parity subsystem (the reference only *loads* pretrained
checkpoints, src/PCA.py:40); the recipe is the standard StyleGAN2 one
(non-saturating logistic loss, lazy R1 on reals, style-mixing
regularization, exponential moving average of G — the "g_ema" the
fingerprint pipeline consumes) expressed as ONE jitted step:

- D update and G update fused in a single program; the driver scans
  this step in chunks so the axon per-dispatch overhead (~0.5 s) is
  amortized over hundreds of steps per device call;
- lazy R1 via `lax.cond` on `step % d_reg_every` — the penalty's
  grad-of-grad runs through the double-backward-tested conv stack
  (tests/test_conv_wrappers.py);
- style mixing with a *traced* crossover index (`jnp.where` over the
  layer axis, not the reference's static `inject_index` python branch,
  src/model.py:531-548 — a static index would retrace per value);
- noise injection is fresh per call from an explicit PRNG key
  (randomize_noise=True training semantics, src/model.py:513-520).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig
from ..models import stylegan2 as sg2
from .data import sample_batch

Params = Any


@dataclass(frozen=True)
class TrainConfig:
    batch: int = 16
    lr: float = 0.002
    beta1: float = 0.0
    beta2: float = 0.99
    r1: float = 10.0
    d_reg_every: int = 16
    mixing: float = 0.9
    ema_decay: float = 0.999
    data_sharp: bool = False  # sharp-feature data variant (see data.py)
    # >0: rank-limited data (data.py _scene_lowdim) --- caps the data
    # manifold's intrinsic dimension to steepen the trained w-spectrum
    data_latent_dim: int = 0


class TrainState(NamedTuple):
    step: jax.Array
    g_params: Params
    d_params: Params
    g_ema: Params
    g_opt: Any
    d_opt: Any


def _optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adam(tcfg.lr, b1=tcfg.beta1, b2=tcfg.beta2, eps=1e-8)


def init_train_state(key: jax.Array, mcfg: ModelConfig, tcfg: TrainConfig) -> TrainState:
    kg, kd = jax.random.split(key)
    g_params = sg2.init_generator_params(kg, mcfg)
    d_params = sg2.init_discriminator_params(kd, mcfg)
    opt = _optimizer(tcfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_ema=jax.tree.map(jnp.asarray, g_params),
        g_opt=opt.init(g_params),
        d_opt=opt.init(d_params),
    )


def _mixed_latent(
    g_params: Params, key: jax.Array, batch: int, mcfg: ModelConfig, mixing: float
) -> jax.Array:
    """[B, n_latent, D] style-mixed latent with traced crossover."""
    kz, kt, kp = jax.random.split(key, 3)
    nl = mcfg.n_latent
    z = jax.random.normal(kz, (2, batch, mcfg.style_dim))
    w = jax.vmap(lambda zz: sg2.mapping_network(g_params, zz, mcfg.lr_mlp))(z)
    t = jax.random.randint(kt, (batch,), 1, nl)  # crossover layer
    use_mix = jax.random.bernoulli(kp, mixing, (batch,))
    t = jnp.where(use_mix, t, nl)  # no mixing -> w1 everywhere
    idx = jnp.arange(nl)[None, :, None]
    return jnp.where(idx < t[:, None, None], w[0][:, None, :], w[1][:, None, :])


def _synthesize(g_params, latent, mcfg: ModelConfig, noise_key) -> jax.Array:
    img, _ = sg2.generate(
        g_params, [latent], mcfg, input_is_latent=True, noise_rng=noise_key
    )
    return img


def _softplus(x):
    return jax.nn.softplus(x)


def make_train_step(
    mcfg: ModelConfig,
    tcfg: TrainConfig,
    external_data: bool = False,
    mesh=None,
):
    """Returns `step(state, key[, real]) -> (state, metrics)`; jit/scan it.

    ``external_data=False`` (default): reals are sampled inside the step
    from the key (the self-contained synthetic distribution, data.py).
    ``external_data=True``: the caller supplies ``real`` — a
    [batch, S, S, 3] f32 array in [-1, 1] — per step (the image-folder
    pipeline, folder.py); the step is otherwise identical.

    ``mesh``: a ('data', ...) `jax.sharding.Mesh` for data-parallel
    training.  Batch tensors (reals, latents, fakes) get
    `with_sharding_constraint` on their leading axis; params stay
    replicated, so XLA's SPMD partitioner runs both network passes
    batch-parallel and reduces the gradients with `psum`s over ICI.
    Semantics are unchanged — the minibatch-stddev layer and every
    batch-mean still see the GLOBAL batch (GSPMD inserts the
    collectives), so a mesh run optimizes the same trajectory as a
    single-device run with the same global batch (tested to tolerance;
    XLA CPU tiling forbids bit-exact cross-device-count comparison).
    """
    opt = _optimizer(tcfg)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def _cb(x):
            spec = P(*(("data",) + (None,) * (x.ndim - 1)))
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
    else:
        def _cb(x):
            return x

    def step(state: TrainState, key: jax.Array, real: jax.Array | None = None):
        k_data, k_lat_d, k_noise_d, k_lat_g, k_noise_g = jax.random.split(key, 5)
        if external_data:
            if real is None:
                raise ValueError("external_data=True requires a real batch per step")
        else:
            real = sample_batch(k_data, tcfg.batch, mcfg.img_size,
                                tcfg.data_sharp, tcfg.data_latent_dim)
        real = _cb(real)

        # ---- D update -------------------------------------------------
        latent_d = _cb(
            _mixed_latent(state.g_params, k_lat_d, tcfg.batch, mcfg, tcfg.mixing)
        )
        fake_d = jax.lax.stop_gradient(
            _cb(_synthesize(state.g_params, latent_d, mcfg, k_noise_d))
        )
        do_r1 = (state.step % tcfg.d_reg_every) == 0

        def d_loss_fn(d_params):
            real_logit = sg2.discriminator_apply(d_params, real, mcfg)
            fake_logit = sg2.discriminator_apply(d_params, fake_d, mcfg)
            adv = jnp.mean(_softplus(-real_logit)) + jnp.mean(_softplus(fake_logit))

            def r1_term(_):
                def d_sum(imgs):
                    return jnp.sum(sg2.discriminator_apply(d_params, imgs, mcfg))

                g = jax.grad(d_sum)(real)
                # lazy reg: applied every k steps, scaled by k
                return (
                    (tcfg.r1 / 2.0)
                    * jnp.mean(jnp.sum(jnp.square(g), axis=(1, 2, 3)))
                    * tcfg.d_reg_every
                )

            r1 = jax.lax.cond(do_r1, r1_term, lambda _: 0.0, operand=None)
            return adv + r1, (adv, r1)

        (d_loss, (d_adv, d_r1)), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params
        )
        d_updates, d_opt = opt.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- G update -------------------------------------------------
        def g_loss_fn(g_params):
            latent = _cb(_mixed_latent(g_params, k_lat_g, tcfg.batch, mcfg, tcfg.mixing))
            fake = _cb(_synthesize(g_params, latent, mcfg, k_noise_g))
            fake_logit = sg2.discriminator_apply(d_params, fake, mcfg)
            return jnp.mean(_softplus(-fake_logit))

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state.g_params)
        g_updates, g_opt = opt.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        d = tcfg.ema_decay
        g_ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, state.g_ema, g_params)

        new_state = TrainState(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_ema=g_ema,
            g_opt=g_opt,
            d_opt=d_opt,
        )
        metrics = {"d_loss": d_adv, "r1": d_r1, "g_loss": g_loss}
        return new_state, metrics

    return step
