# Train the landmark regressor (dlib shape-predictor stand-in) on the
# synthetic parse-rendered face distribution and ship the checkpoint to
# model_trained/landmark_net/checkpoints (loaded by
# ops.landmarks.load_landmark_net).
#
# Usage: python scripts/train_landmark_net.py [steps] [out_dir]

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, 'model_trained', 'landmark_net', 'checkpoints')

    import jax
    import jax.numpy as jnp
    from ctrlhair_tpu.data import landmark_dataset as D
    from ctrlhair_tpu.models.landmark_net import LandmarkNetConfig
    from ctrlhair_tpu.training.landmark_trainer import LandmarkTrainer
    from ctrlhair_tpu.utils.checkpoint import save_checkpoint

    cfg = LandmarkNetConfig(total_step=steps)
    tr = LandmarkTrainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    # Pre-generate a fixed sample pool and upload it ONCE: through the
    # relay, uploading a fresh 12 MB batch per step is ~10x slower than
    # the train step itself.  Batches are an on-device gather + RNG
    # program (same pattern as scripts/train_soak.py).
    pool_n = int(os.environ.get('LM_POOL', '3072'))
    t0 = time.time()
    chunks = [D.training_batch(rng, 256, cfg.input_size)
              for _ in range(pool_n // 256)]
    pool_imgs = np.concatenate([c['image'] for c in chunks])
    pool_lms = np.concatenate([c['landmarks'] for c in chunks])
    pool_pres = np.concatenate([c['presence'] for c in chunks])
    print(f'pool: {pool_imgs.shape[0]} samples generated in '
          f'{time.time() - t0:.1f}s', flush=True)
    # images are renders of uint8-range values: store uint8 on device,
    # normalise per batch (bit-near-exact, 4x less HBM + upload)
    imgs_d = jnp.asarray(np.clip(np.round(
        (pool_imgs + 1.0) * 127.5), 0, 255).astype(np.uint8))
    lms_d = jnp.asarray(pool_lms)
    pres_d = jnp.asarray(pool_pres)
    n_pool = pool_imgs.shape[0]
    B = cfg.total_batch_size

    @jax.jit
    def make_batch(key):
        idx = jax.random.randint(key, (B,), 0, n_pool)
        return {
            'image': jnp.take(imgs_d, idx, axis=0).astype(jnp.float32)
            / 127.5 - 1.0,
            'landmarks': jnp.take(lms_d, idx, axis=0),
            'presence': jnp.take(pres_d, idx, axis=0),
        }

    t0 = time.time()
    for step in range(steps):
        batch = make_batch(jax.random.PRNGKey(step))
        state, m = tr.train_step(state, batch)
        if step % 200 == 0 or step == steps - 1:
            print(f'[{time.time() - t0:7.1f}s] step {step}: '
                  f'coord={float(m["coord"]):.5f} '
                  f'presence={float(m["presence"]):.4f} '
                  f'finite={bool(m["finite"])}', flush=True)
    held = D.training_batch(np.random.default_rng(999), 128,
                            cfg.input_size)
    metrics = tr.eval_metrics(state.model.params,
                              {k: jnp.asarray(v) for k, v in held.items()})
    metrics = {k: float(v) for k, v in metrics.items()}
    print(f'held-out: {metrics}', flush=True)
    save_checkpoint(out_dir, jax.tree_util.tree_map(
        np.asarray, state.model.params), steps, max_keep=1)
    print(f'checkpoint -> {out_dir}', flush=True)
    print('LANDMARK TRAIN PASS', flush=True)


if __name__ == '__main__':
    main()
