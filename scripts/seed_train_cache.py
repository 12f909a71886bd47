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
        args = (state, batch, jax.random.PRNGKey(7))
        t0 = time.time()
        compiled = tr.train_step.lower(*args).compile()
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
        g_args = (state, batch, jax.random.PRNGKey(7))
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
