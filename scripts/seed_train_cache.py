# Seed warm executables for the TRAINER programs (VERDICT r2 item 8).
#
# The fused SEAN G/D/VGG train step is the repo's largest program — ~40 min
# through this environment's serial remote-compile service, and the
# persistent compile cache misses sporadically for programs this size.
# Compiling once here and serializing the executable (utils/aot_cache.py)
# makes every later training launch load it in ~0.1 s.
#
# Usage: python scripts/seed_train_cache.py [sean] [bisenet]
#   (default: sean only — budget ~40 min cold for it)
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    fams = sys.argv[1:] or ['sean']
    import jax
    import jax.numpy as jnp

    from ctrlhair_tpu.utils import aot_cache

    print(f'warm dir: {aot_cache.warm_dir()}', flush=True)

    if 'sean' in fams:
        from ctrlhair_tpu.config import SEANConfig
        from ctrlhair_tpu.training.sean_trainer import SEANTrainer
        cfg = SEANConfig()
        tr = SEANTrainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(4))
        bs = 4
        r = np.random.default_rng(0)
        batch = {'image': jnp.asarray(r.uniform(
                     -1, 1, (bs, cfg.crop_size, cfg.crop_size, 3)),
                     jnp.float32),
                 'label': jnp.asarray(r.integers(
                     0, 19, (bs, cfg.crop_size, cfg.crop_size)),
                     jnp.int32)}
        args = (state, batch, jax.random.PRNGKey(7), tr.vgg_params)
        t0 = time.time()
        compiled = tr.train_step_jit.lower(*args).compile()
        path = aot_cache.save_executable('sean_train_step', compiled, args)
        out_state, metrics = compiled(*args)
        jax.block_until_ready(metrics)
        print(f'sean_train_step: compiled+serialized+ran in '
              f'{time.time() - t0:.1f}s -> {path} '
              f'({os.path.getsize(path) / 1e6:.1f} MB)', flush=True)

    if 'sean_split' in fams:
        # the split-program fallback (SEANTrainer(split_step=True)): compile
        # and serialize the two half-size programs, timing each — this is
        # also the measurement of how much the split saves vs the fused
        # step's compile on this backend
        from ctrlhair_tpu.config import SEANConfig
        from ctrlhair_tpu.training.sean_trainer import SEANTrainer
        cfg = SEANConfig()
        tr = SEANTrainer(cfg, split_step=True)
        state = tr.init_state(jax.random.PRNGKey(4))
        bs = 4
        r = np.random.default_rng(0)
        batch = {'image': jnp.asarray(r.uniform(
                     -1, 1, (bs, cfg.crop_size, cfg.crop_size, 3)),
                     jnp.float32),
                 'label': jnp.asarray(r.integers(
                     0, 19, (bs, cfg.crop_size, cfg.crop_size)),
                     jnp.int32)}
        g_args = (state, batch, jax.random.PRNGKey(7), tr.vgg_params)
        t0 = time.time()
        g_comp = tr.g_step.lower(*g_args).compile()
        tg = time.time() - t0
        path = aot_cache.save_executable('sean_g_step', g_comp, g_args)
        state2, fake, _ = g_comp(*g_args)
        jax.block_until_ready(fake)
        print(f'sean_g_step: compiled in {tg:.1f}s -> {path}', flush=True)
        d_args = (state2, batch, fake)
        t0 = time.time()
        d_comp = tr.d_step.lower(*d_args).compile()
        td = time.time() - t0
        path = aot_cache.save_executable('sean_d_step', d_comp, d_args)
        jax.block_until_ready(d_comp(*d_args)[1]['d_total'])
        print(f'sean_d_step: compiled in {td:.1f}s -> {path}', flush=True)
        print(f'sean split-step total compile: {tg + td:.1f}s', flush=True)

    if 'ct_rec' in fams:
        # The color-texture trainer's split-out rec_img program (a SEAN
        # decode forward+backward at 256px): ~40 min through the relay's
        # compile service, which sporadically drops connections at that
        # scale — so retry until one attempt survives, then serialize.
        # Arg signature must match scripts/train_soak.py's ct stage
        # exactly (same editor seed -> same baked-in frozen SEAN params).
        from ctrlhair_tpu.config import ColorTextureConfig, PipelineConfig
        from ctrlhair_tpu.pipeline.editor import HairEditorTPU
        from ctrlhair_tpu.training.color_texture_trainer import (
            ColorTextureTrainer)
        editor = HairEditorTPU(PipelineConfig(), seed=0)
        cfg = ColorTextureConfig()
        tr = ColorTextureTrainer(cfg, sean=editor.sean,
                                 sean_params=editor.params['sean'],
                                 rec_img_subset=4, split_rec_img=True)
        state, _ = tr.init_state(jax.random.PRNGKey(0))
        B = cfg.total_batch_size
        r = np.random.default_rng(0)
        f32 = lambda *s: jnp.asarray(r.standard_normal(s), jnp.float32)
        batch = {
            'code': f32(B, cfg.style_dim),
            'rgb_mean': f32(B, 3),
            'pca_std': f32(B, 1),
            'noise': f32(B, cfg.noise_dim),
            'noise_curliness': f32(B, 1),
            'curliness_label': f32(B, 1),
            'sean_code': f32(4, 19, 512),
            'label': jnp.asarray(r.integers(0, 19, (4, 256, 256)),
                                 jnp.int32),
            'image': f32(4, 256, 256, 3),
        }
        args = (state.gen.params, state.dis.params, batch,
                editor.params['sean'])
        attempts = int(os.environ.get('CT_REC_ATTEMPTS', '6'))
        for attempt in range(attempts):
            t0 = time.time()
            try:
                compiled = tr._rec_jit.lower(*args).compile()
                break
            except Exception as e:  # noqa: BLE001 — relay drops surface
                # as generic XlaRuntimeError(UNAVAILABLE)/OSError
                print(f'ct_rec compile attempt {attempt + 1}/{attempts} '
                      f'failed after {time.time() - t0:.0f}s: {e!r}',
                      flush=True)
                if attempt == attempts - 1:
                    raise
                time.sleep(90)
        path = aot_cache.save_executable('ct_rec_img_grads', compiled, args)
        (loss, grads) = compiled(*args)
        jax.block_until_ready(loss)
        print(f'ct_rec_img_grads: compiled+serialized+ran in '
              f'{time.time() - t0:.1f}s -> {path} '
              f'({os.path.getsize(path) / 1e6:.1f} MB)', flush=True)

    if 'bisenet' in fams:
        from ctrlhair_tpu.config import BiSeNetConfig
        from ctrlhair_tpu.training.bisenet_trainer import BiSeNetTrainer
        cfg = BiSeNetConfig()
        tr = BiSeNetTrainer(cfg, lr=1e-3)
        state = tr.init_state(jax.random.PRNGKey(0))
        bs = 16
        r = np.random.default_rng(0)
        batch = {'image': jnp.asarray(r.standard_normal(
                     (bs, cfg.input_size, cfg.input_size, 3)), jnp.float32),
                 'label': jnp.asarray(r.integers(
                     0, 19, (bs, cfg.input_size, cfg.input_size)),
                     jnp.int32)}
        args = (state, batch, jax.random.PRNGKey(1))
        t0 = time.time()
        compiled = tr.train_step.lower(*args).compile()
        path = aot_cache.save_executable('bisenet_train_step', compiled,
                                         args)
        out_state, metrics = compiled(*args)
        jax.block_until_ready(metrics)
        print(f'bisenet_train_step: compiled+serialized+ran in '
              f'{time.time() - t0:.1f}s -> {path} '
              f'({os.path.getsize(path) / 1e6:.1f} MB)', flush=True)

    print('SEED TRAIN DONE', flush=True)


if __name__ == '__main__':
    main()
