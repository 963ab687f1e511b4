"""Full nonlinear-manifold autoencoder (the TestAE variant's model).

Flax replacement of the reference's ScaledAutoencoder
(BurgersFD_CleanTestAE/AE/train_autoencoder.py:35-73): ReLU MLP
input -> 512 -> 256 -> 128 -> 64 -> z and mirrored decoder, with
per-feature standardization (mean/std of the training snapshots) applied
around the network. The scaling vectors live alongside the params (not as
module attributes) so the module stays hashable for jit. The decoder
Jacobian is jax.jacfwd instead of torch.autograd.functional.jacobian
(BurgersFD_CleanTestAE/hypernet2D.py:2054-2139).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


_HI = jax.lax.Precision.HIGHEST   # true-f32 GEMMs on TPU (precision.py)


class Encoder(nn.Module):
    """ELU where the reference uses ReLU (TestAE
    AE/train_autoencoder.py:42-48): the decoder feeds a Gauss-Newton
    LSPG solver through jacfwd, and a ReLU manifold is piecewise linear
    with dead-unit rank collapse — its Jacobian loses usable tangent
    directions and the online solver stalls. ELU keeps the same
    architecture but a C^1 decoder."""
    latent_dim: int
    hidden: Sequence[int] = (512, 256, 128, 64)

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.elu(nn.Dense(h, precision=_HI)(x))
        return nn.Dense(self.latent_dim, precision=_HI)(x)


class Decoder(nn.Module):
    output_dim: int
    hidden: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, z):
        for h in self.hidden:
            z = nn.elu(nn.Dense(h, precision=_HI)(z))
        return nn.Dense(self.output_dim, precision=_HI)(z)


class Autoencoder(nn.Module):
    """Encoder/decoder on *standardized* inputs."""
    input_dim: int
    latent_dim: int

    def setup(self):
        self.encoder = Encoder(latent_dim=self.latent_dim)
        self.decoder = Decoder(output_dim=self.input_dim)

    def encode(self, x_scaled):
        return self.encoder(x_scaled)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x_scaled):
        return self.decode(self.encode(x_scaled))


class ScaledAE(NamedTuple):
    """Trained autoencoder bundle: module + params + standardization."""
    module: Autoencoder
    params: dict
    mu_in: jnp.ndarray    # (input_dim,)
    sig_in: jnp.ndarray   # (input_dim,)

    @property
    def net_dtype(self):
        import jax
        return jax.tree_util.tree_leaves(self.params)[0].dtype

    def forward(self, x):
        d = self.net_dtype
        xs = ((x - self.mu_in) / self.sig_in).astype(d)
        recon = self.module.apply(self.params, xs).astype(x.dtype)
        return recon * self.sig_in + self.mu_in

    def encode(self, x):
        d = self.net_dtype
        xs = ((x - self.mu_in) / self.sig_in).astype(d)
        return self.module.apply(self.params, xs,
                                 method=self.module.encode).astype(x.dtype)

    def decode(self, z):
        recon = self.module.apply(self.params, z.astype(self.net_dtype),
                                  method=self.module.decode)
        return recon.astype(z.dtype) * self.sig_in + self.mu_in


def init_autoencoder(input_dim: int, latent_dim: int, key=None,
                     dtype=jnp.float32):
    if key is None:
        key = jax.random.PRNGKey(0)
    module = Autoencoder(input_dim=input_dim, latent_dim=latent_dim)
    params = module.init(key, jnp.zeros(input_dim, dtype))
    return module, params


def ae_decoder_fns(ae: ScaledAE):
    """(decode, dec_jac, encode) for the AE-LSPG ROM (manifold_rom)."""
    decode = ae.decode
    jac = jax.jacfwd(decode)
    dec_jac = lambda z, w=None: jac(z)
    return decode, dec_jac, ae.encode
