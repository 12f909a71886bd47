# SEAN (region-adaptive normalization pix2pix) — TPU-native reformulation.
#
# Functional redesign of the reference's mode-dispatched Pix2PixModel
# (ref: sean_codes/models/pix2pix_model.py:39-74):
#   * encode  = Zencoder conv stack + one masked-mean segment reduction
#     (replaces the per-(image, region) Python loop at
#      sean_codes/models/networks/architecture.py:195-203 with a single
#      [N·HW,19] x [19,512] style matmul),
#   * decode  = SPADE/ACE generator where every per-region fc_mu<j> Linear
#     (ref: normalization.py:191-215) becomes one batched einsum
#     [19,512,512] x [N,19,512], and the masked_scatter_ region broadcast
#     (ref: normalization.py:124-153) becomes a one-hot matmul
#     [N,H,W,19] x [N,19,C] — both MXU-shaped, no data-dependent shapes.
#
# There are no 'train'/'test'/'UI_mode' status strings: callers pass style
# codes; train-time stochastic ACE noise is an explicit rng argument.

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ctrlhair_tpu.config import SEANConfig
from ctrlhair_tpu.models.layers import (
    InstanceNorm, TorchConv, TorchConvTranspose, leaky_relu)
from ctrlhair_tpu.ops.resize import downsample_label_pyramid
from ctrlhair_tpu.utils.masks import label_to_one_hot

Dtype = jnp.dtype


class Zencoder(nn.Module):
    """Image -> dense style map (ref: architecture.py:154-175).

    conv3(reflect) -> IN -> lrelu; 2x stride-2 downsample; 1x up-transpose;
    final conv to style_dim + tanh.  256 input -> 128x128x512 map.
    """
    cfg: SEANConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        ngf = self.cfg.zencoder_ngf
        x = img.astype(self.dtype)
        x = TorchConv(ngf, 3, 1, 1, pad_type='reflect', dtype=self.dtype,
                      name='stem')(x)
        x = InstanceNorm(dtype=self.dtype)(x)
        x = leaky_relu(x)
        for i in range(2):
            x = TorchConv(ngf * 2 ** (i + 1), 3, 2, 1, dtype=self.dtype,
                          name=f'down_{i}')(x)
            x = InstanceNorm(dtype=self.dtype)(x)
            x = leaky_relu(x)
        x = TorchConvTranspose(ngf * 8, 3, 2, 1, 1, dtype=self.dtype,
                               name='up_0')(x)
        x = InstanceNorm(dtype=self.dtype)(x)
        x = leaky_relu(x)
        x = TorchConv(self.cfg.style_dim, 3, 1, 1, pad_type='reflect',
                      dtype=self.dtype, name='out')(x)
        return jnp.tanh(x)


def region_style_pool(code_map: jnp.ndarray, seg_onehot: jnp.ndarray
                      ) -> jnp.ndarray:
    """Masked mean-pool of a style map into per-region codes.

    code_map: [N, H, W, D]; seg_onehot: [N, H, W, R] (same H, W).
    Returns [N, R, D]; regions with zero area yield all-zero codes, matching
    the reference's zero-initialised codes_vector (architecture.py:193-203).
    """
    seg = seg_onehot.astype(code_map.dtype)
    summed = jnp.einsum('nhwr,nhwd->nrd', seg, code_map,
                        precision=jax.lax.Precision.HIGHEST)
    area = jnp.sum(seg, axis=(1, 2))[..., None]
    return jnp.where(area > 0, summed / jnp.maximum(area, 1.0), 0.0)


class SPADE(nn.Module):
    """Plain SPADE gamma/beta head (ref: normalization.py:218-257)."""
    norm_nc: int
    hidden: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, seg: jnp.ndarray):
        h = TorchConv(self.hidden, 3, 1, 1, dtype=self.dtype,
                      name='mlp_shared')(seg)
        h = nn.relu(h)
        gamma = TorchConv(self.norm_nc, 3, 1, 1, dtype=self.dtype,
                          name='mlp_gamma')(h)
        beta = TorchConv(self.norm_nc, 3, 1, 1, dtype=self.dtype,
                         name='mlp_beta')(h)
        return gamma, beta


class ACE(nn.Module):
    """Region-adaptive (de)normalization (ref: normalization.py:70-189)."""
    cfg: SEANConfig
    norm_nc: int
    use_styles: bool = True
    axis_name: Optional[str] = None   # cross-replica sync-BN under shard_map
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, seg: jnp.ndarray,
                 style_codes: Optional[jnp.ndarray], *,
                 train: bool = False,
                 noise_rng: Optional[jax.Array] = None) -> jnp.ndarray:
        cfg = self.cfg
        c = self.norm_nc
        # Part 1: optional learned stochastic noise + parameter-free norm.
        noise_var = self.param('noise_var', nn.initializers.zeros, (c,))
        if cfg.use_ace_noise and noise_rng is not None:
            n = jax.random.normal(noise_rng, x.shape[:3] + (1,), self.dtype)
            x = x + n * noise_var.astype(self.dtype)
        if cfg.param_free_norm == 'instance':
            normalized = InstanceNorm(dtype=self.dtype)(x)
        else:  # syncbatch: BatchNorm(affine=False); sync comes from axis_name
            normalized = nn.BatchNorm(
                use_running_average=not train, use_bias=False, use_scale=False,
                momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                axis_name=self.axis_name, name='pfn')(x)

        gamma_spade, beta_spade = SPADE(c, cfg.spade_hidden, dtype=self.dtype,
                                        name='spade')(seg)
        if self.use_styles:
            d = cfg.style_dim
            r = cfg.semantic_nc
            # All 19 fc_mu<j> linears as one batched einsum: [R,D,D]x[N,R,D].
            w_mu = self.param(
                'fc_mu_kernel',
                nn.initializers.variance_scaling(1 / 3, 'fan_in', 'uniform'),
                (r, d, d))
            b_mu = self.param('fc_mu_bias', nn.initializers.zeros, (r, d))
            mu = jnp.einsum(
                'rio,nri->nro', w_mu.astype(self.dtype),
                style_codes.astype(self.dtype)) + b_mu.astype(self.dtype)
            mu = nn.relu(mu)
            if cfg.fold_style_convs:
                # conv(one_hot (x) mu) folded through the kernel: the dense
                # 512-channel middle map is piecewise constant per region, so
                # conv_gamma(middle_avg)[p] = sum_taps shift(seg)[p] @
                # (K[tap] @ mu) + bias — 19-wide matmuls instead of 512-wide
                # convs (exact by linearity; ~27x fewer FLOPs here).
                gamma_avg = self._folded_style_conv(
                    'conv_gamma', c, seg, mu)
                beta_avg = self._folded_style_conv(
                    'conv_beta', c, seg, mu)
            else:
                # Broadcast region vectors into the spatial map via one-hot
                # matmul (replaces masked_scatter_, normalization.py:139/153)
                middle_avg = jnp.einsum('nhwr,nrd->nhwd', seg, mu)
                gamma_avg = TorchConv(c, 3, 1, 1, dtype=self.dtype,
                                      name='conv_gamma')(middle_avg)
                beta_avg = TorchConv(c, 3, 1, 1, dtype=self.dtype,
                                     name='conv_beta')(middle_avg)
            bg = self.param('blending_gamma', nn.initializers.zeros, (1,))
            bb = self.param('blending_beta', nn.initializers.zeros, (1,))
            ga = nn.sigmoid(bg).astype(self.dtype)
            ba = nn.sigmoid(bb).astype(self.dtype)
            gamma = ga * gamma_avg + (1 - ga) * gamma_spade
            beta = ba * beta_avg + (1 - ba) * beta_spade
        else:
            gamma, beta = gamma_spade, beta_spade
        return normalized * (1 + gamma) + beta

    def _folded_style_conv(self, name: str, c: int, seg: jnp.ndarray,
                           mu: jnp.ndarray) -> jnp.ndarray:
        """Apply the named 3x3 conv to (seg one-hot (x) mu) without ever
        materialising the dense map.  Parameter tree is identical to the
        dense path (the TorchConv module itself produces the per-tap
        projections when driven with 1x1 style 'images' and pad=2)."""
        n, h, w, r = seg.shape
        d = mu.shape[-1]
        conv = TorchConv(c, 3, 1, 2, dtype=self.dtype, name=name)
        # v[n, r, y, x, c] = K[2-y, 2-x] @ mu[n, r] + bias
        v = conv(mu.reshape(n * r, 1, 1, d)).reshape(n, r, 3, 3, c)
        bias = conv(jnp.zeros((1, 1, 1, d), self.dtype))[0]   # [3,3,c]
        vb = v - bias[None, None]
        segp = jnp.pad(seg, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = jnp.broadcast_to(bias[0, 0], (n, h, w, c)).astype(self.dtype)
        for ky in range(3):
            for kx in range(3):
                shifted = segp[:, ky:ky + h, kx:kx + w, :]
                out = out + jnp.einsum('nhwr,nrc->nhwc', shifted,
                                       vb[:, :, 2 - ky, 2 - kx])
        return out


class SPADEResnetBlock(nn.Module):
    """ACE -> lrelu -> conv x2 with (optionally learned) shortcut
    (ref: architecture.py:21-96)."""
    cfg: SEANConfig
    fin: int
    fout: int
    use_styles: bool = True
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, seg, style_codes, train=False, noise_rng=None):
        # `train` stays positional so nn.remat can mark it static
        fmiddle = min(self.fin, self.fout)
        learned_shortcut = self.fin != self.fout

        def rng():
            nonlocal noise_rng
            if noise_rng is None:
                return None
            noise_rng, sub = jax.random.split(noise_rng)
            return sub

        dx = ACE(self.cfg, self.fin, self.use_styles,
                 axis_name=self.axis_name, dtype=self.dtype,
                 name='ace_0')(x, seg, style_codes, train=train,
                               noise_rng=rng())
        dx = TorchConv(fmiddle, 3, 1, 1, dtype=self.dtype,
                       name='conv_0')(leaky_relu(dx))
        dx = ACE(self.cfg, fmiddle, self.use_styles,
                 axis_name=self.axis_name, dtype=self.dtype,
                 name='ace_1')(dx, seg, style_codes, train=train,
                               noise_rng=rng())
        dx = TorchConv(self.fout, 3, 1, 1, dtype=self.dtype,
                       name='conv_1')(leaky_relu(dx))
        if learned_shortcut:
            xs = ACE(self.cfg, self.fin, self.use_styles,
                     axis_name=self.axis_name, dtype=self.dtype,
                     name='ace_s')(x, seg, style_codes, train=train,
                                   noise_rng=rng())
            xs = TorchConv(self.fout, 1, 1, 0, use_bias=False,
                           dtype=self.dtype, name='conv_s')(xs)
        else:
            xs = x
        return xs + dx


class SEANGenerator(nn.Module):
    """SPADE generator with SEAN blocks (ref: generator.py:14-109).

    Takes a tuple of one-hot segmentation maps — one per internal resolution
    (start, start*2, ..., crop_size) — plus [N, 19, 512] per-region style
    codes, and renders an NHWC image in [-1, 1].
    """
    cfg: SEANConfig
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, seg_pyramid: Sequence[jnp.ndarray],
                 style_codes: jnp.ndarray, *, train: bool = False,
                 noise_rng: Optional[jax.Array] = None) -> jnp.ndarray:
        cfg = self.cfg
        nf = cfg.ngf

        from ctrlhair_tpu.ops.resize import upsample2x_nearest_nhwc as up

        def rng():
            nonlocal noise_rng
            if noise_rng is None:
                return None
            noise_rng, sub = jax.random.split(noise_rng)
            return sub

        # optional per-block rematerialisation (jax.checkpoint) for training
        block_cls = (nn.remat(SPADEResnetBlock,
                              static_argnums=(4,))  # `train` kwarg position
                     if (cfg.remat_blocks and train) else SPADEResnetBlock)

        def block(name, fin, fout, x, seg, use_styles=True):
            return block_cls(cfg, fin, fout, use_styles=use_styles,
                             axis_name=self.axis_name,
                             dtype=self.dtype, name=name)(
                x, seg, style_codes, train, rng())

        segs = [s.astype(self.dtype) for s in seg_pyramid]
        x = TorchConv(16 * nf, 3, 1, 1, dtype=self.dtype, name='fc')(segs[0])
        x = block('head_0', 16 * nf, 16 * nf, x, segs[0])
        x = up(x)
        for m in range(cfg.num_middle_blocks):
            x = block(f'G_middle_{m}', 16 * nf, 16 * nf, x, segs[1])
        # default (num_up_layers=5): 4 up blocks with channels
        # 16nf->8nf->4nf->2nf->nf, styles off in the last — exactly the
        # reference topology (generator.py:97-106); smaller num_up_layers
        # shortens the chain for dry-run builds
        n_up = cfg.num_up_layers - 1
        chans = [16 * nf] + [nf * 2 ** (n_up - 1 - i) for i in range(n_up)]
        for i in range(n_up):
            x = up(x)
            x = block(f'up_{i}', chans[i], chans[i + 1], x, segs[2 + i],
                      use_styles=(i < n_up - 1))
        x = TorchConv(3, 3, 1, 1, dtype=self.dtype,
                      name='conv_img')(leaky_relu(x))
        return jnp.tanh(x).astype(jnp.float32)


class ConvEncoder(nn.Module):
    """Image -> (mu, logvar) VAE encoder — SEAN's style-variational path
    (ref: sean_codes/models/networks/encoder.py:13-55).  Unused by the
    editing runtime (like the reference), provided for training parity."""
    cfg: SEANConfig
    latent_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray):
        ndf = self.cfg.ngf
        x = img.astype(self.dtype)
        chans = [ndf, ndf * 2, ndf * 4, ndf * 8, ndf * 8, ndf * 8]
        for i, c in enumerate(chans):
            x = TorchConv(c, 3, 2, 1, dtype=self.dtype,
                          name=f'layer{i}')(x)
            x = InstanceNorm(dtype=self.dtype)(x)
            x = leaky_relu(x)
        x = x.reshape(x.shape[0], -1)
        mu = nn.Dense(self.latent_dim, dtype=self.dtype, name='fc_mu')(x)
        logvar = nn.Dense(self.latent_dim, dtype=self.dtype,
                          name='fc_var')(x)
        return mu, logvar


class SEAN(nn.Module):
    """Bundled Zencoder + generator with the two public entry points."""
    cfg: SEANConfig
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        self.zencoder = Zencoder(self.cfg, dtype=self.dtype)
        self.generator = SEANGenerator(self.cfg, axis_name=self.axis_name,
                                       dtype=self.dtype)

    def pyramid_sizes(self) -> Tuple[int, ...]:
        s = self.cfg.start_size
        return tuple(s * 2 ** i
                     for i in range(self.cfg.num_up_layers + 1))

    def encode(self, img: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
        """img [N,H,W,3] in [-1,1]; label [N,H,W] int -> [N,19,512] codes.

        (ref: pix2pix_model.py mode='style_code')
        """
        # pool in f32: style codes are the precision-sensitive interface
        code_map = self.zencoder(img).astype(jnp.float32)
        # pool at the code-map resolution (128x128 for 256 input)
        from ctrlhair_tpu.ops.resize import resize_nearest
        small = resize_nearest(label, code_map.shape[1:3])
        seg_small = label_to_one_hot(small, self.cfg.semantic_nc)
        return region_style_pool(code_map, seg_small)

    def decode(self, label: jnp.ndarray, style_codes: jnp.ndarray, *,
               train: bool = False,
               noise_rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """label [N,H,W] int + codes [N,19,512] -> image [N,H,W,3] in [-1,1].

        (ref: pix2pix_model.py mode='UI_mode' / 'inference')
        """
        sizes = self.pyramid_sizes()
        labels = downsample_label_pyramid(label, sizes)
        segs = tuple(label_to_one_hot(l, self.cfg.semantic_nc) for l in labels)
        return self.generator(segs, style_codes, train=train,
                              noise_rng=noise_rng)

    def __call__(self, img, label):
        # init path: exercise both submodules
        codes = self.encode(img, label)
        return self.decode(label, codes)
