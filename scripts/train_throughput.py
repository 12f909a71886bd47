# Measure training steps/s for every trainer family on the real chip, at
# the reference's operating sizes (SEAN 256px, BiSeNet 512px, shape 256px,
# color_texture/predictor MLPs at their config batch sizes).
# Usage: python scripts/train_throughput.py [families...]
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def steps_per_sec(step, state, make_batch, extra=(), iters=10):
    import jax
    state2, m = step(state, make_batch(0), *extra)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for i in range(iters):
        state2, m = step(state2, make_batch(i + 1), *extra)
    jax.block_until_ready(m)
    return iters / (time.perf_counter() - t0)


def main():
    import jax
    import jax.numpy as jnp
    from ctrlhair_tpu.pipeline.editor import enable_compilation_cache
    enable_compilation_cache()
    from ctrlhair_tpu.config import (BiSeNetConfig, ColorTextureConfig,
                                     PredictorConfig, SEANConfig,
                                     ShapeConfig)

    fams = sys.argv[1:] or ['color_texture', 'predictor', 'shape',
                            'bisenet', 'sean']
    rng = np.random.default_rng(0)
    results = {}

    if 'color_texture' in fams:
        from ctrlhair_tpu.training.color_texture_trainer import (
            ColorTextureTrainer, synthetic_batch)
        cfg = ColorTextureConfig()
        tr = ColorTextureTrainer(cfg)
        state, pred = tr.init_state(jax.random.PRNGKey(0))
        bs = 128   # ref total_batch_size (color_texture config.py:68)
        mk = lambda i: synthetic_batch(jax.random.PRNGKey(i), cfg, bs)
        sps = steps_per_sec(lambda s, b: tr.train_step(
            s, b, pred, jax.random.PRNGKey(7)), state, mk)
        results['color_texture_steps_per_sec'] = round(sps, 2)
        print(f'color_texture (batch {bs}): {sps:.2f} steps/s '
              f'(ref 650k steps => {650100 / max(sps, 1e-9) / 3600:.1f} h)',
              flush=True)

    if 'predictor' in fams:
        from ctrlhair_tpu.training.predictor_trainer import PredictorTrainer
        cfg = PredictorConfig()
        tr = PredictorTrainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(1))
        bs = 256
        def mk(i):
            r = np.random.default_rng(i)
            b = {'code': jnp.asarray(
                r.standard_normal((bs, 512)), jnp.float32)}
            for name, dim in cfg.predict_dict.items():
                b[name] = jnp.asarray(r.standard_normal((bs, dim)),
                                      jnp.float32)
            return b
        sps = steps_per_sec(
            lambda s, b: tr.train_step(s, b, jax.random.PRNGKey(7)),
            state, mk)
        results['predictor_steps_per_sec'] = round(sps, 2)
        print(f'predictor (batch {bs}): {sps:.2f} steps/s', flush=True)

    if 'shape' in fams:
        from ctrlhair_tpu.training.shape_trainer import (ShapeTrainer,
                                                         synthetic_batch)
        cfg = ShapeConfig()
        tr = ShapeTrainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(2))
        bs = 4     # ref shape config.py:68
        mk = lambda i: synthetic_batch(jax.random.PRNGKey(i), cfg, bs)
        sps = steps_per_sec(
            lambda s, b: tr.train_step(s, b, jax.random.PRNGKey(7)),
            state, mk)
        results['shape_steps_per_sec'] = round(sps, 2)
        print(f'shape (batch {bs} @{cfg.img_size}px): {sps:.2f} steps/s '
              f'(ref 380k steps => {380002 / max(sps, 1e-9) / 3600:.1f} h)',
              flush=True)

    if 'bisenet' in fams:
        from ctrlhair_tpu.training.bisenet_trainer import BiSeNetTrainer
        cfg = BiSeNetConfig()
        tr = BiSeNetTrainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(3))
        bs = 16
        def mk(i):
            r = np.random.default_rng(i)
            return {'image': jnp.asarray(r.standard_normal(
                        (bs, cfg.input_size, cfg.input_size, 3)),
                        jnp.float32),
                    'label': jnp.asarray(r.integers(
                        0, 19, (bs, cfg.input_size, cfg.input_size)),
                        jnp.int32)}
        sps = steps_per_sec(
            lambda s, b: tr.train_step(s, b, jax.random.PRNGKey(7)),
            state, mk)
        results['bisenet_steps_per_sec'] = round(sps, 2)
        print(f'bisenet (batch {bs} @{cfg.input_size}px): {sps:.2f} steps/s',
              flush=True)

    if 'sean' in fams:
        from ctrlhair_tpu.training.sean_trainer import SEANTrainer
        cfg = SEANConfig()
        tr = SEANTrainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(4))
        bs = 4
        def mk(i):
            r = np.random.default_rng(i)
            return {'image': jnp.asarray(r.uniform(
                        -1, 1, (bs, cfg.crop_size, cfg.crop_size, 3)),
                        jnp.float32),
                    'label': jnp.asarray(r.integers(
                        0, 19, (bs, cfg.crop_size, cfg.crop_size)),
                        jnp.int32)}
        sps = steps_per_sec(
            lambda s, b: tr.train_step(s, b, jax.random.PRNGKey(7)),
            state, mk)
        results['sean_steps_per_sec'] = round(sps, 2)
        print(f'sean (batch {bs} @{cfg.crop_size}px): {sps:.2f} steps/s',
              flush=True)

    import json
    print(json.dumps(results))


if __name__ == '__main__':
    main()
