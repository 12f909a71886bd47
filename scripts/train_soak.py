# Training SOAK (VERDICT r2 item 5): the reference training story run at
# real scale on the best data constructible in this image.
#
# Data: the reference's 50 aligned sample portraits (/root/reference/imgs),
# augmented x4 (mirror + 2 HSV jitters), with PSEUDO-LABELS from the
# canonical FFHQ-aligned parse geometry (all reference samples are aligned
# crops, so the canonical template's hair/face regions land on real hair
# and face pixels — colour/variance stats and hair codes then carry REAL
# image statistics, unlike round 2's random-parser noise masks).  No
# trained checkpoints exist in this environment; this is the honest
# maximum (ref data contract: dataset_info_ctrlhair/, README.md:95-107).
#
# Pipeline (ref: README.md:109-204 four trainings + the vendored SEAN):
#   A.  stage+augment data, pseudo-labels
#   A2. SEAN pix2pix reconstruction on the staged pairs (the visual
#       foundation: every rendered artifact downstream goes through it)
#   A3. L0 prep chain (SEAN codes with the TRAINED encoder), curliness lists
#   B0. BiSeNet parser on the pseudo-labels
#   B.  predictors (rgb p004 + curliness p002), held-out metrics
#   C.  color_texture GAN, batch 128, schedules SCALED so every step-gated
#       loss fires (lambda_rec_img renders through the trained-frozen SEAN
#       at the ref's subset=4, ref solver.py:270-299)
#   D.  shape mask VAE-GAN on a generated warp pool (KL free-bits floor
#       against hair-latent collapse)
#   E.  direction curation: data-driven regression directions, gated on
#       MEASURED liveliness (R^2 + decoded-mask probe deltas) before any
#       pickle ships; curation writes to a staging dir and only installs
#       into the repo on a PASS
#   F.  artifacts: loss curves, validation canvases, evidence grids —
#       re-rendered whenever their INPUT fingerprints change (net states +
#       shipped pickles), never served stale across resumes
#   G.  ship deployment checkpoints into the repo tree (bf16 for the big
#       families; sean/shape are written but gitignored — 267M/241M params
#       outsize a git history, exactly why the reference distributes
#       model_trained/ out-of-band, ref: .MISSING_LARGE_BLOBS) so THIS
#       checkout's Backend boots trained weights everywhere
#
# Throughput note: per-step dispatch through this environment's serial TPU
# relay costs ~0.2 s wall regardless of device time (r4: shape 4.4 steps/s
# wall vs 242 enqueued), so the ct/shape/bisenet/predictor/SEAN loops run
# lax.scan CHUNKS of steps per dispatch (training/chunked.ChunkRunner) —
# device-limited throughput with identical RNG streams to the per-step
# path.  Only the ct rec_img tail runs per-step (its fused-with-scan
# program is the compile size class this relay's compile service drops).
#
# Deadline: SOAK_DEADLINE_TS (epoch seconds) bounds the run — training
# stages stop early (full-state resumable) so curation/artifacts/shipping
# ALWAYS complete before round close (VERDICT r4: a still-running soak
# destroyed the round's official record twice).
#
# Usage: python scripts/train_soak.py [workdir] [ct_steps] [shape_steps]
import dataclasses
import hashlib
import json
import os
import pickle
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# SOAK_ART / SOAK_SHIP=0: smoke runs write artifacts elsewhere and never
# touch the repo tree (model_trained/, artifacts/soak) — only the real
# soak installs deliverables.
ART = os.environ.get('SOAK_ART', os.path.join(REPO, 'artifacts', 'soak'))
SHIP = os.environ.get('SOAK_SHIP', '1') != '0'

t00 = time.time()
DEADLINE_TS = float(os.environ.get('SOAK_DEADLINE_TS', '0'))


def stamp(msg):
    print(f'[{time.time() - t00:7.1f}s] {msg}', flush=True)


def time_left() -> float:
    return (DEADLINE_TS - time.time()) if DEADLINE_TS else float('inf')


# --------------------------------------------------------------- stage A

def canonical_parse(size=256, mirror=False, cx=0.5, cy=0.54, fw=0.26,
                    fh=0.34, hair_rx=1.35, hair_ry=1.22, hairline=0.30):
    """CelebA-style pseudo-parse for an FFHQ-aligned portrait: skin ellipse,
    hair cap, eyes/brows/nose/mouth at canonical aligned positions.  The
    same geometry the landmark template encodes (ops/landmarks.py).
    Geometry parameters are exposed so every image gets a JITTERED template
    (VERDICT r3 item 4: one fixed mask teaches the parser a constant)."""
    from ctrlhair_tpu.constants import PARSING_LABEL_LIST
    L = {n: i for i, n in enumerate(PARSING_LABEL_LIST)}
    lab = np.zeros((size, size), np.int32)

    def ellipse(cx, cy, rx, ry, value):
        yy, xx = np.mgrid[0:size, 0:size]
        m = (((xx - cx * size) / (rx * size)) ** 2
             + ((yy - cy * size) / (ry * size)) ** 2) <= 1
        lab[m] = value

    ellipse(cx, cy - 0.06, fw * hair_rx, fh * hair_ry, L['hair'])
    ellipse(cx, cy, fw, fh, L['skin_other'])
    yy = np.arange(size)[:, None]
    lab[(yy < hairline * size) & (lab == L['skin_other'])] = L['hair']
    ex, ey = 0.45 * fw, cy - 0.30 * fh
    ellipse(cx - ex, ey - 0.14 * fh, 0.22 * fw, 0.02 * fh, L['l_brow'])
    ellipse(cx + ex, ey - 0.14 * fh, 0.22 * fw, 0.02 * fh, L['r_brow'])
    ellipse(cx - ex, ey, 0.17 * fw, 0.05 * fh, L['l_eye'])
    ellipse(cx + ex, ey, 0.17 * fw, 0.05 * fh, L['r_eye'])
    ellipse(cx, cy + 0.05 * fh, 0.13 * fw, 0.22 * fh, L['nose'])
    my = cy + 0.55 * fh
    ellipse(cx, my - 0.03 * fh, 0.30 * fw, 0.045 * fh, L['u_lip'])
    ellipse(cx, my + 0.03 * fh, 0.30 * fw, 0.045 * fh, L['l_lip'])
    ellipse(cx, my, 0.24 * fw, 0.022 * fh, L['mouth'])
    # neck + background stay 0/neck-free: background label is 0 already
    if mirror:
        lab = lab[:, ::-1].copy()
    return lab


def jittered_parse(rng, size=256):
    """Per-image template: geometry drawn from plausible FFHQ-aligned
    ranges, so no two images share a label map even before refinement."""
    return canonical_parse(
        size=size,
        cx=0.5 + rng.uniform(-0.02, 0.02),
        cy=0.54 + rng.uniform(-0.02, 0.02),
        fw=0.26 * rng.uniform(0.90, 1.10),
        fh=0.34 * rng.uniform(0.92, 1.08),
        hair_rx=rng.uniform(1.22, 1.50),
        hair_ry=rng.uniform(1.08, 1.36),
        hairline=rng.uniform(0.26, 0.34))


def refine_parse_to_image(img, lab, rng):
    """Adapt the template's HAIR region to image evidence: colour-model
    region scoring grown from the template's hair seed (pure numpy/cv2,
    VERDICT r3 item 4 — 'refine the hair boundary against image
    evidence').  The template's inner-face features (eyes/brows/nose/
    mouth) are protected; hair may claim nearby skin (hairline variation)
    and released template-hair pixels fall back to background or skin."""
    import cv2
    from ctrlhair_tpu.constants import PARSING_LABEL_LIST
    L = {n: i for i, n in enumerate(PARSING_LABEL_LIST)}
    hair0 = lab == L['hair']
    if hair0.sum() < 200:
        return lab
    blur = cv2.GaussianBlur(img.astype(np.float32), (0, 0), 3)
    seed = cv2.erode(hair0.astype(np.uint8),
                     np.ones((11, 11), np.uint8)) > 0
    if seed.sum() < 200:
        seed = hair0
    # ROBUST colour model: the template's hair ring overlaps background in
    # many photos, so mean/std over the raw seed blow the tolerance up and
    # the grown mask swallows the frame (caught visually: hair area 0.46).
    # Median+MAD, one refit on the inlier seed, a tighter growth
    # neighbourhood, and an area cap keep the mask hair-sized.
    px = blur[seed]
    mu = np.median(px, axis=0)
    sd = 1.4826 * np.median(np.abs(px - mu), axis=0) + 4.0
    inlier = (((px - mu) / sd) ** 2).sum(axis=-1) < 4.0
    if inlier.sum() > 200:
        mu = np.median(px[inlier], axis=0)
        sd = 1.4826 * np.median(np.abs(px[inlier] - mu), axis=0) + 4.0
    dist = (((blur - mu) / sd) ** 2).sum(axis=-1)
    allowed = cv2.dilate(hair0.astype(np.uint8),
                         np.ones((15, 15), np.uint8)) > 0
    protected = np.isin(lab, [L['l_eye'], L['r_eye'], L['l_brow'],
                              L['r_brow'], L['nose'], L['mouth'],
                              L['u_lip'], L['l_lip']])
    core = seed & (dist < 9.0)      # seed pixels the colour model accepts
    if core.sum() < 200:
        core = seed
    tau = float(rng.uniform(5.0, 7.0))   # per-image tolerance
    cap = 1.45 * hair0.mean()
    while True:
        new_hair = (((dist < tau) & allowed & ~protected) | core)
        new_hair = cv2.morphologyEx(new_hair.astype(np.uint8),
                                    cv2.MORPH_CLOSE,
                                    np.ones((9, 9), np.uint8)) > 0
        # keep only components that touch the seed (drop matched clutter)
        n_cc, cc = cv2.connectedComponents(new_hair.astype(np.uint8))
        keep = np.zeros(n_cc, bool)
        keep[np.unique(cc[core])] = True
        keep[0] = False
        new_hair = keep[cc]
        if new_hair.mean() <= cap or tau <= 1.5:
            break
        tau *= 0.7

    out = lab.copy()
    # released template-hair pixels: skin if adjacent to the face, else bg
    released = hair0 & ~new_hair
    near_skin = cv2.dilate((lab == L['skin_other']).astype(np.uint8),
                           np.ones((9, 9), np.uint8)) > 0
    out[released & near_skin] = L['skin_other']
    out[released & ~near_skin] = 0
    out[new_hair] = L['hair']
    return out


def hsv_jitter(img, dh, dv, rng):
    import cv2
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.int32)
    hsv[..., 0] = (hsv[..., 0] + dh) % 180
    hsv[..., 2] = np.clip(hsv[..., 2] + dv, 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


def stage_data(work):
    from PIL import Image
    src = '/root/reference/imgs'
    names = sorted(f for f in os.listdir(src) if f.endswith('.png'))
    rng = np.random.default_rng(0)
    count = 0
    for f in names:
        ds, name = f.split('___', 1)
        base = os.path.splitext(name)[0]
        img = np.asarray(Image.open(os.path.join(src, f)).convert('RGB'))
        img_dir = os.path.join(work, ds, 'images_256')
        lab_dir = os.path.join(work, ds, 'label')
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(lab_dir, exist_ok=True)
        # per-image label: jittered template geometry refined against the
        # image's own colour statistics (VERDICT r3 item 4).  The hue-
        # jitter variants keep the base label (hue rotation moves colours,
        # not boundaries); the mirror variant mirrors it.
        parse = refine_parse_to_image(img, jittered_parse(rng), rng)
        parse_m = parse[:, ::-1].copy()
        variants = {
            base: (img, parse),
            base + '_m': (img[:, ::-1].copy(), parse_m),
            base + '_j1': (hsv_jitter(img, int(rng.integers(10, 90)),
                                      int(rng.integers(-40, 40)), rng),
                           parse),
            base + '_j2': (hsv_jitter(img, int(rng.integers(90, 170)),
                                      int(rng.integers(-40, 40)), rng),
                           parse),
        }
        for key, (im, la) in variants.items():
            Image.fromarray(im).save(os.path.join(img_dir, key + '.png'))
            Image.fromarray(la.astype(np.uint8)).save(
                os.path.join(lab_dir, key + '.png'))
            count += 1
    return count


def curliness_lists(work, catalog):
    """Manual-label stand-in: hair-region Laplacian variance quantiles
    (straight/smooth hair = low high-frequency energy).  Writes the
    reference's manual_label/curliness/{-1,1,test_-1,test_1}.txt contract
    (ref: dataset.py:82-87)."""
    import cv2
    from ctrlhair_tpu.constants import HAIR_IDX
    scores = {}
    for key in catalog.items:
        img = cv2.imread(catalog.image_path(key))
        lab = cv2.imread(catalog.label_path(key), cv2.IMREAD_GRAYSCALE)
        hair = lab == HAIR_IDX
        if hair.sum() < 100:
            continue
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype(np.float32)
        lapl = cv2.Laplacian(gray, cv2.CV_32F)
        scores[key] = float(np.var(lapl[hair]))
    keys = sorted(scores, key=scores.get)
    n = len(keys) // 3
    straight, curly = keys[:n], keys[-n:]
    out = os.path.join(work, 'manual_label', 'curliness')
    os.makedirs(out, exist_ok=True)
    train = set(catalog.train_items)
    for label, ks in (('-1', straight), ('1', curly)):
        with open(os.path.join(out, f'{label}.txt'), 'w') as f:
            f.write('\n'.join(k for k in ks if k in train))
        with open(os.path.join(out, f'test_{label}.txt'), 'w') as f:
            f.write('\n'.join(k for k in ks if k not in train))
    return len(straight), len(curly)


# --------------------------------------------------------------- plotting

def plot_curves(metrics_rows, keys, path, title):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 4.5))
    steps = [r['step'] for r in metrics_rows]
    for k in keys:
        vals = [r.get(k) for r in metrics_rows]
        if any(v is not None for v in vals):
            ax.plot(steps, [v if v is not None else np.nan for v in vals],
                    label=k, linewidth=1)
    ax.set_xlabel('step')
    ax.set_yscale('symlog')
    ax.legend(fontsize=7, ncol=3)
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


# Full-train-state checkpointing (params + Adam moments + step counter)
# so an interrupted soak resumes EXACTLY where it stopped: relay sessions
# are shorter than the soak, and re-running 20k GAN steps from params-only
# checkpoints would reset the optimizer moments mid-curve.
def save_train_state(path, state, rows):
    import flax.serialization
    import jax
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(flax.serialization.to_bytes(jax.device_get(state)))
    os.replace(tmp, path)
    with open(path + '.rows.json', 'w') as f:
        json.dump(rows, f)


def load_train_state(path, target):
    if not os.path.exists(path):
        return None
    import flax.serialization
    with open(path, 'rb') as f:
        state = flax.serialization.from_bytes(target, f.read())
    rows = []
    if os.path.exists(path + '.rows.json'):
        with open(path + '.rows.json') as f:
            rows = json.load(f)
    return state, rows


def retry_compile(fn, *args, attempts=8, wait=90):
    """First-call (compile) guard: the relay's remote-compile service
    sporadically drops long compiles with UNAVAILABLE/Broken pipe, and a
    crashed TPU worker can take several minutes to restart (r5: a worker
    crash outlived a 4x90s window and killed an otherwise-healthy soak);
    the compile is stateless, so retrying is safe and patience is cheap."""
    for i in range(attempts - 1):
        try:
            return fn(*args)
        except Exception as e:   # noqa: BLE001
            msg = str(e)
            transient = any(s in msg for s in (
                'UNAVAILABLE', 'Network Error', 'Broken pipe',
                'Connection reset', 'Socket closed'))
            if not transient:
                raise
            stamp(f'relay dropped the compile (attempt {i + 1}/{attempts}: '
                  f'{msg[:120]}); retrying in {wait}s')
            time.sleep(wait)
    return fn(*args)


def train_family(family, state_path, runner, state, start, stop, *,
                 chunk_size, record_every, rows, save_every, floor,
                 per_step, extra_args=()):
    """Train steps [start, stop) for one model family: chunked lax.scan
    dispatch with a per-step fallback that is crash-loop-proof across
    process restarts.

    The bisenet chunk-of-steps compile reproducibly CRASHES this
    environment's TPU worker (observed twice in r5); a worker crash
    invalidates every device buffer in the process, so even the in-process
    fallback may die — the `.chunk_attempt` marker survives the process,
    and the relaunched soak (scripts/soak_supervisor.sh) goes straight to
    the proven per-step program for that family instead of re-crashing
    the worker forever.

    per_step(state, step) -> (state, metrics): one host-loop optimizer
    step with the same RNG stream as the chunked path.
    Returns (state, rows, finite_trips).
    """
    import jax
    import jax.numpy as jnp
    finite_trips = 0
    marker = state_path + '.chunk_attempt'
    last_saved = [start]

    def cb(next_step, st, rws):
        if next_step - last_saved[0] >= save_every or next_step >= stop:
            save_train_state(state_path, st, rows + rws)
            last_saved[0] = next_step
        return time_left() < floor

    if not os.path.exists(marker):
        with open(marker, 'w') as f:
            f.write(str(time.time()))
        try:
            state, rws, finite_trips = retry_compile(
                lambda: runner.run(state, start, stop,
                                   chunk_size=chunk_size,
                                   record_every=record_every,
                                   extra_args=extra_args, on_chunk=cb),
                attempts=2, wait=60)
            rows = rows + rws
            os.remove(marker)
            save_train_state(state_path, state, rows)
            return state, rows, finite_trips
        except Exception as e:   # noqa: BLE001
            stamp(f'{family}: chunked path failed ({str(e)[:140]}); '
                  'falling back to the per-step program')
    else:
        stamp(f'{family}: a previous process died during the chunk '
              'compile (marker present) — using the per-step program')

    # the failed chunked attempt may have consumed (donated) the caller's
    # device state mid-run: resume from the last on-disk save
    res = load_train_state(state_path, state)
    if res is not None:
        state, rows = res
    step0 = max(int(np.asarray(state.step)), start)
    rows = [r for r in rows if r['step'] < step0]
    fin_dev = jnp.zeros((), jnp.int32)
    n_fin = 0
    for step in range(step0, stop):
        if step == step0:
            state, m = retry_compile(per_step, state, step)
        else:
            state, m = per_step(state, step)
        if 'finite' in m:
            fin_dev = fin_dev + jnp.asarray(m['finite'], jnp.int32)
            n_fin += 1
        if step % record_every == 0 or step == stop - 1:
            rows.append({'step': step,
                         **{k: float(v) for k, v in m.items()}})
        if (step + 1) % save_every == 0 or step == stop - 1:
            save_train_state(state_path, state, rows)
        if time_left() < floor:
            stamp(f'{family}: deadline pressure — stopping early '
                  '(resumable)')
            save_train_state(state_path, state, rows)
            break
    finite_trips += n_fin - int(np.asarray(fin_dev))
    return state, rows, finite_trips


# ------------------------------------------------- cumulative bookkeeping

def add_progress(work, family, steps_this_run, seconds_this_run,
                 step_now):
    """Accumulate per-family training totals across resumed runs
    (VERDICT r4 weak #7: a resume that trains 0 steps must not zero the
    throughput record of the run that did the training)."""
    path = os.path.join(work, 'soak_state', 'progress.json')
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    fam = data.setdefault(family, {'steps_total': 0, 'seconds_total': 0.0,
                                   'best_steps_per_sec': 0.0})
    fam['steps_total'] += int(steps_this_run)
    fam['seconds_total'] = round(fam['seconds_total']
                                 + float(seconds_this_run), 1)
    if steps_this_run > 0 and seconds_this_run > 0:
        sps = steps_this_run / seconds_this_run
        fam['best_steps_per_sec'] = round(
            max(fam['best_steps_per_sec'], sps), 2)
    fam['step'] = int(step_now)
    tmp = path + '.tmp'
    with open(tmp, 'w') as f:
        json.dump(data, f, indent=1)
    os.replace(tmp, path)
    return {'steps': int(step_now),
            'steps_this_run': int(steps_this_run),
            'seconds_this_run': round(float(seconds_this_run), 1),
            'steps_per_sec_this_run': round(
                steps_this_run / max(seconds_this_run, 1e-9), 2),
            'steps_total_all_runs': fam['steps_total'],
            'seconds_total_all_runs': fam['seconds_total'],
            'best_steps_per_sec': fam['best_steps_per_sec']}


def _dir_hash(d):
    h = hashlib.sha1()
    if os.path.isdir(d):
        for name in sorted(os.listdir(d)):
            p = os.path.join(d, name)
            if os.path.isfile(p):
                with open(p, 'rb') as f:
                    h.update(name.encode() + f.read())
    return h.hexdigest()


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else '/tmp/ctrlhair_soak'
    ct_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    shape_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 100000
    chunk = int(os.environ.get('SOAK_CHUNK', '500'))

    import jax
    import jax.numpy as jnp
    from ctrlhair_tpu.config import (
        ColorTextureConfig, PipelineConfig, ShapeConfig,
        curliness_predictor_config, rgb_predictor_config)
    from ctrlhair_tpu.data import prep
    from ctrlhair_tpu.data.catalog import DataCatalog
    from ctrlhair_tpu.pipeline.editor import HairEditorTPU
    from ctrlhair_tpu.training.chunked import ChunkRunner
    from ctrlhair_tpu.utils.checkpoint import (load_checkpoint,
                                               save_checkpoint)

    os.makedirs(ART, exist_ok=True)
    summary = {'work': work, 'ct_steps': ct_steps,
               'shape_steps': shape_steps,
               'deadline_s_at_start': (round(time_left(), 1)
                                       if DEADLINE_TS else None)}
    state_dir = os.path.join(work, 'soak_state')
    os.makedirs(state_dir, exist_ok=True)

    # ---------------- A: data (resumable: the relay's compile service
    # drops connections sporadically; a restart must not redo finished
    # stages)
    stage_marker = os.path.join(work, '.stage_done')
    if os.path.exists(stage_marker):
        stamp('stage A already complete (marker found); resuming')
    else:
        n = stage_data(work)
        stamp(f'staged {n} augmented images with pseudo-labels')
        with open(stage_marker, 'w') as f:
            f.write('done')
    editor = HairEditorTPU(PipelineConfig(), seed=0)
    datasets = sorted(d for d in os.listdir(work)
                      if os.path.isdir(os.path.join(work, d, 'images_256')))
    catalog = DataCatalog(work, datasets, filter_female_and_frontal=False)
    stamp(f'catalog: {len(catalog.items)} items, '
          f'{len(catalog.train_items)} train')

    import cv2
    from PIL import Image

    # shared device-resident image/label pool at the staged 256px (uint8:
    # uploads once; per-batch gather + augment run on device)
    pool_imgs, pool_labs = [], []
    for k in catalog.train_items:
        pool_imgs.append(cv2.cvtColor(cv2.imread(catalog.image_path(k)),
                                      cv2.COLOR_BGR2RGB))
        pool_labs.append(np.asarray(Image.open(catalog.label_path(k))
                                    ).astype(np.uint8))
    img_pool_d = jnp.asarray(np.stack(pool_imgs))      # [T,256,256,3] u8
    lab_pool_d = jnp.asarray(np.stack(pool_labs))      # [T,256,256]   u8
    n_pool_imgs = img_pool_d.shape[0]

    # -------- A2: SEAN pix2pix reconstruction (the visual foundation —
    # r4's soak rendered every canvas through a RANDOM-INIT SEAN, so all
    # committed evidence was uniform grey, VERDICT r4 weak #5).  No
    # pretrained VGG19 exists in this image, so the perceptual slot is
    # filled by a pixel L1 (adv + FM + L1); reconstruction quality on the
    # training set is the goal — this is the capability demo, not
    # generalization.  (ref: sean_codes trainers + base_options.py:21-26.)
    from ctrlhair_tpu.training.sean_trainer import SEANTrainer
    from ctrlhair_tpu.models.layers import spectral_normalize_tree

    sean_steps = int(os.environ.get('SOAK_SEAN_STEPS', '12000'))
    sean_chunk = int(os.environ.get('SOAK_SEAN_CHUNK', '25'))
    sean_B = int(os.environ.get('SOAK_SEAN_BATCH', '8'))
    sean_tr = SEANTrainer(editor.cfg.sean, use_vgg=False, lambda_l1=10.0,
                          split_step=True)
    sean_state = sean_tr.init_state(jax.random.PRNGKey(5))
    sean_state_path = os.path.join(state_dir, 'sean.msgpack')
    sean_rows, sean_start = [], 0
    resumed = load_train_state(sean_state_path, sean_state)
    if resumed is not None:
        sean_state, sean_rows = resumed
        sean_start = min(int(np.asarray(sean_state.step)), sean_steps)
        sean_rows = [r for r in sean_rows if r['step'] < sean_start]
        stamp(f'sean: resumed full train state at step {sean_start}')

    @jax.jit
    def make_sean_batch(key):
        ki, km = jax.random.split(key)
        idx = jax.random.randint(ki, (sean_B,), 0, n_pool_imgs)
        mir = jax.random.randint(km, (sean_B,), 0, 2) == 1
        img = jnp.take(img_pool_d, idx, axis=0).astype(jnp.float32)
        lab = jnp.take(lab_pool_d, idx, axis=0).astype(jnp.int32)
        img = jnp.where(mir[:, None, None, None], img[:, :, ::-1], img)
        lab = jnp.where(mir[:, None, None], lab[:, :, ::-1], lab)
        return {'image': img / 127.5 - 1.0, 'label': lab}

    t0 = time.time()
    sean_done = 0
    if sean_start < sean_steps and time_left() > 900:
        last_saved = [sean_start]

        def sean_cb(next_step, st, rws):
            if next_step - last_saved[0] >= 1000 or next_step >= sean_steps:
                save_train_state(sean_state_path, st, sean_rows + rws)
                last_saved[0] = next_step
            return time_left() < 600

        runner = ChunkRunner(sean_tr._train_step, make_sean_batch,
                             batch_seed=4_000_000)
        host_backup = jax.device_get(sean_state)
        try:
            sean_state, rws, _ = retry_compile(
                lambda: runner.run(sean_state, sean_start, sean_steps,
                                   chunk_size=sean_chunk, record_every=100,
                                   on_chunk=sean_cb))
            sean_rows += rws
        except Exception as e:   # noqa: BLE001 — fused-chunk compile too
            # big for the relay: fall back to the split per-step programs
            stamp(f'sean chunked path failed ({str(e)[:160]}); '
                  'falling back to split per-step programs')
            sean_state = jax.tree_util.tree_map(jnp.asarray, host_backup)
            for step in range(sean_start, sean_steps):
                batch = make_sean_batch(
                    jax.random.PRNGKey(4_000_000 + step))
                if step == sean_start:
                    sean_state, m = retry_compile(
                        sean_tr.train_step, sean_state, batch,
                        jax.random.PRNGKey(step))
                    stamp(f'sean split step compiled+first run in '
                          f'{time.time() - t0:.1f}s')
                else:
                    sean_state, m = sean_tr.train_step(
                        sean_state, batch, jax.random.PRNGKey(step))
                if step % 100 == 0 or step == sean_steps - 1:
                    sean_rows.append({'step': step,
                                      **{k: float(v)
                                         for k, v in m.items()}})
                if step % 1000 == 999 or step == sean_steps - 1:
                    save_train_state(sean_state_path, sean_state,
                                     sean_rows)
                if time_left() < 600:
                    stamp('sean: deadline pressure — stopping early '
                          '(resumable)')
                    break
        save_train_state(sean_state_path, sean_state, sean_rows)
        sean_done = int(np.asarray(sean_state.step)) - sean_start
    elif sean_start < sean_steps:
        stamp(f'sean: skipped ({time_left():.0f}s left < 900s floor); '
              'resumable')
    sean_dt = time.time() - t0
    sean_step_now = int(np.asarray(sean_state.step))
    summary['sean'] = add_progress(work, 'sean', sean_done, sean_dt,
                                   sean_step_now)
    if sean_rows:
        summary['sean']['final'] = sean_rows[-1]
    stamp(f'sean: {sean_done} steps this run in {sean_dt:.0f}s '
          f'({sean_done / max(sean_dt, 1e-9):.1f} steps/s); '
          f'at step {sean_step_now}/{sean_steps}')
    with open(os.path.join(ART, 'sean_losses.json'), 'w') as f:
        json.dump(sean_rows, f)
    if sean_rows:
        plot_curves(sean_rows, ['g_total', 'd_total', 'g/adv', 'g/feat',
                                'g/l1'],
                    os.path.join(ART, 'sean_losses.png'),
                    f'SEAN pix2pix soak (step {sean_step_now}, '
                    f'batch {sean_B}, adv+FM+L1)')

    # install the trained SEAN into the editor (spectral norm folded):
    # every downstream stage — code prep, ct rec_img, curation renders,
    # canvases — now goes through trained weights
    if sean_step_now > 0:
        inner = sean_state.gen.params['params']
        if sean_state.sn_u is not None:
            inner, _ = spectral_normalize_tree(inner, sean_state.sn_u)
        sean_vars = {'params': jax.device_get(inner)}
        if jax.tree_util.tree_leaves(sean_state.gen_stats):
            sean_vars['batch_stats'] = jax.device_get(sean_state.gen_stats)
        editor.params = dict(editor.params, sean=jax.tree_util.tree_map(
            jnp.asarray, sean_vars))
        stamp('trained SEAN installed into the editor')
    del sean_state

    # reconstruction sanity canvas: input vs SEAN re-render for 6 images
    recon_path = os.path.join(ART, 'sean_recon.png')
    sean_fp_path = recon_path + '.fp'
    sean_fp = hashlib.sha1(f'{sean_step_now}'.encode()).hexdigest()
    if (not os.path.exists(recon_path)
            or not os.path.exists(sean_fp_path)
            or open(sean_fp_path).read() != sean_fp):
        idxs = np.linspace(0, n_pool_imgs - 1, 6).astype(int)
        rows_img = []
        for i in idxs:
            img = pool_imgs[i]
            lab = jnp.asarray(pool_labs[i].astype(np.int32))[None]
            codes = editor.sean.apply(
                editor.params['sean'],
                jnp.asarray(img, jnp.float32)[None] / 127.5 - 1.0, lab,
                method=editor.sean.encode)
            render = np.asarray(editor.sean.apply(
                editor.params['sean'], lab, codes,
                method=editor.sean.decode))[0]
            render = ((render + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
            rows_img.append(np.concatenate([img, render], axis=0))
        from ctrlhair_tpu.utils.image import write_rgb
        write_rgb(recon_path, np.concatenate(rows_img, axis=1))
        with open(sean_fp_path, 'w') as f:
            f.write(sean_fp)
        stamp('sean reconstruction canvas written')

    # -------- A3: L0 prep chain with the TRAINED encoder
    prep_marker = os.path.join(work, '.prep_done')
    if os.path.exists(prep_marker):
        with open(os.path.join(work, 'sean_code_dict.pkl'), 'rb') as f:
            codes = pickle.load(f)
        stamp('stage A3 (prep) already complete; resuming')
    else:
        codes = prep.compute_sean_codes(
            editor, catalog, os.path.join(work, 'sean_code_dict.pkl'),
            batch_size=8)
        prep.compute_color_stats(
            catalog, os.path.join(work, 'rgb_stat_dict.pkl'),
            os.path.join(work, 'hsv_stat_dict_ordered.pkl'))
        prep.compute_color_variance(
            catalog, os.path.join(work, 'color_var_stat_dict.pkl'))
        prep.compute_mean_style_codes(codes,
                                      os.path.join(work, 'mean_style_code'))
        ns, nc = curliness_lists(work, catalog)
        stamp(f'prep done; curliness lists: {ns} straight / {nc} curly')
        with open(prep_marker, 'w') as f:
            f.write('done')

    # ---------------- B0: BiSeNet parser on the pseudo-labels.  Training
    # the parser on the same pseudo-labels the rest of the soak uses makes
    # analyze_image produce the geometry the codes were computed from —
    # the whole E/F stage (curation scores, sweep canvases, slider grids)
    # becomes meaningful.  (ref: external_code/face_parsing/train.py.)
    from ctrlhair_tpu.constants import CELEBA_TO_BISENET
    from ctrlhair_tpu.models.bisenet import normalize_imagenet
    from ctrlhair_tpu.training.bisenet_trainer import BiSeNetTrainer

    bn_steps = int(os.environ.get('SOAK_BISENET_STEPS', '5000'))
    bn_trainer = BiSeNetTrainer(editor.cfg.bisenet)
    bn_state = bn_trainer.init_state(jax.random.PRNGKey(3))
    bn_state_path = os.path.join(state_dir, 'bisenet.msgpack')
    bn_rows = []
    bn_start = 0
    resumed_bn = load_train_state(bn_state_path, bn_state)
    if resumed_bn is not None:
        bn_state, bn_rows = resumed_bn
        bn_start = min(int(np.asarray(bn_state.step)), bn_steps)
        bn_rows = [r for r in bn_rows if r['step'] < bn_start]
        stamp(f'bisenet: resumed full train state at step {bn_start}')

    # labels pre-remapped to BiSeNet class order on host: a [N,512,512]
    # 19-entry gather crawls on TPU, numpy does 200 maps in ms
    bn_lab_d = jnp.asarray(np.stack(
        [CELEBA_TO_BISENET[la.astype(np.int64)].astype(np.uint8)
         for la in pool_labs]))
    bn_B = 16
    bn_size = editor.cfg.bisenet.input_size

    @jax.jit
    def make_bn_batch(key):
        ki, km = jax.random.split(key)
        idx = jax.random.randint(ki, (bn_B,), 0, n_pool_imgs)
        mir = jax.random.randint(km, (bn_B,), 0, 2) == 1
        img = jnp.take(img_pool_d, idx, axis=0).astype(jnp.float32)
        lab = jnp.take(bn_lab_d, idx, axis=0).astype(jnp.int32)
        img = jnp.where(mir[:, None, None, None], img[:, :, ::-1], img)
        lab = jnp.where(mir[:, None, None], lab[:, :, ::-1], lab)
        rep = bn_size // img.shape[1]
        img = jnp.repeat(jnp.repeat(img, rep, axis=1), rep, axis=2)
        lab = jnp.repeat(jnp.repeat(lab, rep, axis=1), rep, axis=2)
        return {'image': normalize_imagenet(img / 255.0), 'label': lab}

    t0 = time.time()
    bn_done = 0
    if bn_start < bn_steps and time_left() > 600:
        bn_runner = ChunkRunner(bn_trainer._train_step, make_bn_batch,
                                batch_seed=3_000_000)

        def bn_per_step(st, step):
            return bn_trainer.train_step(
                st, make_bn_batch(jax.random.PRNGKey(3_000_000 + step)),
                jax.random.PRNGKey(step))

        bn_state, bn_rows, _ = train_family(
            'bisenet', bn_state_path, bn_runner, bn_state, bn_start,
            bn_steps, chunk_size=min(chunk, 250), record_every=100,
            rows=bn_rows, save_every=1000, floor=420,
            per_step=bn_per_step)
        bn_done = int(np.asarray(bn_state.step)) - bn_start
    elif bn_start < bn_steps:
        stamp(f'bisenet: skipped ({time_left():.0f}s left); resumable')
    bn_dt = time.time() - t0
    bn_step_now = int(np.asarray(bn_state.step))
    summary['bisenet'] = add_progress(work, 'bisenet', bn_done, bn_dt,
                                      bn_step_now)
    stamp(f'bisenet: {bn_done} steps this run in {bn_dt:.0f}s '
          f'({bn_done / max(bn_dt, 1e-9):.1f} steps/s)')

    # install the trained parser: keep only the inference-net keys (the
    # trainer's return_aux adds conv_out16/32 heads the editor net lacks)
    bn_params_full = jax.tree_util.tree_map(np.asarray,
                                            bn_state.model.params['params'])
    infer_keys = set(editor.params['bisenet']['params'].keys())
    stat_keys = set(editor.params['bisenet']['batch_stats'].keys())
    bn_stats_full = jax.tree_util.tree_map(np.asarray, bn_state.stats)
    bn_variables = {
        'params': {k: v for k, v in bn_params_full.items()
                   if k in infer_keys},
        'batch_stats': {k: v for k, v in bn_stats_full.items()
                        if k in stat_keys},
    }
    editor.params = dict(editor.params, bisenet=jax.tree_util.tree_map(
        jnp.asarray, bn_variables))
    save_checkpoint(os.path.join(work, 'model_trained', 'bisenet',
                                 'checkpoints'),
                    bn_variables, bn_step_now, max_keep=2)
    # held-out sanity: pixel accuracy + hair IoU of the parser vs the
    # pseudo-labels through the editor's OWN _parse path (CelebA order)
    from ctrlhair_tpu.constants import HAIR_IDX as _HAIR
    ev = catalog.test_items[:8] if catalog.test_items \
        else catalog.train_items[:8]
    accs, ious = [], []
    for k in ev:
        img = cv2.cvtColor(cv2.imread(catalog.image_path(k)),
                           cv2.COLOR_BGR2RGB)
        gt = np.asarray(Image.open(catalog.label_path(k))).astype(np.int32)
        pred = np.asarray(editor.parse(
            editor.params, jnp.asarray(img)[None]))[0]
        pred = cv2.resize(pred.astype(np.uint8), gt.shape[::-1],
                          interpolation=cv2.INTER_NEAREST).astype(np.int32)
        accs.append(float((pred == gt).mean()))
        inter = ((pred == _HAIR) & (gt == _HAIR)).sum()
        union = ((pred == _HAIR) | (gt == _HAIR)).sum()
        ious.append(float(inter / max(union, 1)))
    summary['bisenet'].update({
        'final': bn_rows[-1] if bn_rows else None,
        'eval_pixel_acc': round(float(np.mean(accs)), 4),
        'eval_hair_iou': round(float(np.mean(ious)), 4),
        # per-image spread: with per-image (jittered+refined) labels this
        # must NOT collapse to a constant (VERDICT r3 item 4 'done')
        'eval_hair_iou_per_image': [round(v, 4) for v in ious],
        'eval_hair_iou_spread': round(float(np.std(ious)), 4)})
    stamp(f'bisenet installed: pixel acc {np.mean(accs):.4f}, '
          f'hair IoU {np.mean(ious):.4f} '
          f'(per-image std {np.std(ious):.4f})')
    with open(os.path.join(ART, 'bisenet_losses.json'), 'w') as f:
        json.dump(bn_rows, f)
    if bn_rows:
        plot_curves(bn_rows, ['main', 'aux16', 'aux32', 'total'],
                    os.path.join(ART, 'bisenet_losses.png'),
                    f'BiSeNet parser soak (step {bn_step_now}, '
                    f'batch {bn_B})')
    del bn_state

    # ---------------- B: predictors (chunked)
    from ctrlhair_tpu.data.color_texture_dataset import ColorTextureDataset
    from ctrlhair_tpu.training.predictor_trainer import PredictorTrainer

    # rec_img activates on a ~500-step RAMP near the END of training (the
    # reference's proportion: step 600k of 650k, ref config.py:35), with a
    # 4x GAN-LR drop at activation (VERDICT r3 item 3's ramp+drop)
    rec_tail = int(os.environ.get('SOAK_CT_REC_STEPS', '3000'))
    rec_on_step = max(ct_steps - rec_tail, 0)
    ct_cfg = dataclasses.replace(
        ColorTextureConfig(),
        total_step=ct_steps,
        lambda_rec_img={0: 0.0,
                        rec_on_step: 100.0,
                        rec_on_step + 125: 325.0,
                        rec_on_step + 250: 550.0,
                        rec_on_step + 375: 775.0,
                        rec_on_step + 500: 1000.0},
        lr_g={0: 0.0002, rec_on_step: 0.00005},
        lr_d={0: 0.0002, rec_on_step: 0.00005},
    )
    dataset = ColorTextureDataset(ct_cfg, work, catalog=catalog,
                                  datasets=datasets)
    stamp(f'ct dataset: {len(dataset.train_keys)} train / '
          f'{len(dataset.test_keys)} test')

    # device pools shared by the predictor + ct stages
    tkeys = dataset.train_keys
    codes_d = jnp.asarray(dataset.train[0])
    rgb_d = jnp.asarray(dataset.train[1])
    pca_d = jnp.asarray(dataset.train[2])
    n_train = len(tkeys)

    def eval_predictor(tr, variables, tb):
        """Held-out metrics with the ADVICE r4 guard: test_batch /
        curliness_batch are Optional (no test split, single-class lists) —
        a resumed soak must not crash on the robustness path."""
        if tb is None:
            return {'note': 'no held-out batch available'}
        rv = dict(variables)
        rstats = rv.pop('batch_stats', {})
        m = tr.eval_metrics(rv, rstats, {
            k: jnp.asarray(v) for k, v in tb.items() if k != 'items'})
        return {k: float(v) for k, v in m.items()}

    pred_params = {}
    pred_metrics = {}
    for which, cfg_fn in (('rgb', rgb_predictor_config),
                          ('curliness', curliness_predictor_config)):
        pcfg = dataclasses.replace(cfg_fn(), total_step=2000)
        tr = PredictorTrainer(pcfg)
        state = tr.init_state(jax.random.PRNGKey(0))
        out_dir = os.path.join(work, 'model_trained',
                               f'{which}_predictor', 'checkpoints')
        variables = dict(state.model.params)
        if jax.tree_util.tree_leaves(state.stats):
            variables['batch_stats'] = state.stats
        resumed = load_checkpoint(out_dir, variables)
        tb = (dataset.curliness_batch(64) if which == 'curliness'
              else dataset.test_batch(64))
        if resumed is not None and resumed[1] >= pcfg.total_step:
            pred_params[which] = resumed[0]
            pred_metrics[which] = eval_predictor(tr, resumed[0], tb)
            stamp(f'predictor[{which}] resumed from checkpoint; '
                  f'held-out {pred_metrics[which]}')
            continue

        Bp = pcfg.total_batch_size
        if which == 'rgb':
            @jax.jit
            def make_pred_batch(key):
                idx = jax.random.randint(key, (Bp,), 0, n_train)
                return {'code': jnp.take(codes_d, idx, axis=0),
                        'rgb_mean': jnp.take(rgb_d, idx, axis=0),
                        'pca_std': jnp.take(pca_d, idx, axis=0)}
        else:
            if set(dataset.curliness) != {-1, 1}:
                stamp('predictor[curliness] skipped: single-class lists')
                pred_params[which] = variables
                pred_metrics[which] = {'note': 'single-class lists'}
                continue
            straight_d = jnp.asarray(dataset.curliness[-1])
            curly_d = jnp.asarray(dataset.curliness[1])

            @jax.jit
            def make_pred_batch(key):
                k1, k2 = jax.random.split(key)
                i1 = jnp.take(straight_d, jax.random.randint(
                    k1, (Bp // 2,), 0, straight_d.shape[0]))
                i2 = jnp.take(curly_d, jax.random.randint(
                    k2, (Bp // 2,), 0, curly_d.shape[0]))
                code = jnp.take(codes_d, jnp.concatenate([i1, i2]), axis=0)
                label = jnp.concatenate([
                    -jnp.ones((Bp // 2, 1)), jnp.ones((Bp // 2, 1))])
                return {'code': code, 'curliness_label': label}

        runner = ChunkRunner(tr._train_step, make_pred_batch,
                             batch_seed=5_000_000)

        def pred_per_step(st, step, _mb=make_pred_batch, _tr=tr):
            return _tr.train_step(
                st, _mb(jax.random.PRNGKey(5_000_000 + step)),
                jax.random.PRNGKey(step))

        state, rows_p, _ = train_family(
            f'predictor[{which}]',
            os.path.join(state_dir, f'pred_{which}.msgpack'),
            runner, state, 0, pcfg.total_step,
            chunk_size=min(chunk, 500), record_every=200, rows=[],
            save_every=1000, floor=300, per_step=pred_per_step)
        variables = dict(state.model.params)
        if jax.tree_util.tree_leaves(state.stats):
            variables['batch_stats'] = state.stats
        pred_metrics[which] = eval_predictor(tr, variables, tb)
        pred_params[which] = variables
        save_checkpoint(out_dir, jax.tree_util.tree_map(
            np.asarray, pred_params[which]), pcfg.total_step)
        stamp(f'predictor[{which}] trained: held-out {pred_metrics[which]}')
    summary['predictor_metrics'] = pred_metrics

    # ---------------- C: color_texture GAN (chunked to rec_on, then the
    # split per-step path for the rec_img tail)
    from ctrlhair_tpu.constants import HAIR_IDX
    from ctrlhair_tpu.training.color_texture_trainer import (
        ColorTextureTrainer)

    full_codes = {k: np.asarray(v, np.float32) for k, v in codes.items()}
    img_cache, lab_cache = {}, {}
    for k in dataset.train_keys:
        img_cache[k] = (cv2.cvtColor(cv2.imread(catalog.image_path(k)),
                                     cv2.COLOR_BGR2RGB).astype(np.float32)
                        / 127.5 - 1.0)
        la = cv2.imread(catalog.label_path(k), cv2.IMREAD_GRAYSCALE)
        lab_cache[k] = cv2.resize(la, (256, 256),
                                  interpolation=cv2.INTER_NEAREST
                                  ).astype(np.int32)

    trainer = ColorTextureTrainer(
        ct_cfg, sean=editor.sean, sean_params=editor.params['sean'],
        rec_img_subset=4, split_rec_img=True)
    state, _ = trainer.init_state(jax.random.PRNGKey(0))
    frozen_preds = {'rgb': pred_params['rgb'],
                    'curliness': pred_params['curliness']}

    sean_d = jnp.asarray(np.stack([full_codes[k] for k in tkeys]))
    lab_d = jnp.asarray(np.stack([lab_cache[k] for k in tkeys]), jnp.int32)
    img_d = jnp.asarray(np.stack([img_cache[k] for k in tkeys]),
                        jnp.float32)
    B = ct_cfg.total_batch_size

    @jax.jit
    def make_ct_batch(key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        idx = jax.random.randint(k1, (B,), 0, n_train)
        ridx = jax.random.randint(k2, (4,), 0, n_train)
        label = jnp.where(jax.random.uniform(k3, (B, 1)) < 0.5, 1.0, -1.0)
        return {
            'code': jnp.take(codes_d, idx, axis=0),
            'rgb_mean': jnp.take(rgb_d, idx, axis=0),
            'pca_std': jnp.take(pca_d, idx, axis=0),
            'noise': jax.random.normal(k4, (B, ct_cfg.noise_dim)),
            'noise_curliness': (jnp.abs(jax.random.normal(k5, (B, 1)))
                                * label),
            'curliness_label': label,
            'sean_code': jnp.take(sean_d, ridx, axis=0),
            'label': jnp.take(lab_d, ridx, axis=0),
            'image': jnp.take(img_d, ridx, axis=0),
        }

    def ct_batch(step):
        return make_ct_batch(jax.random.PRNGKey(1_000_000 + step))

    rows = []
    finite_trips = 0
    ckpt_dir = os.path.join(work, 'model_trained', 'color_texture',
                            'checkpoints')
    state_path = os.path.join(state_dir, 'ct.msgpack')
    start_step = 0
    resumed_ct = load_train_state(state_path, state)
    if resumed_ct is not None:
        state, rows = resumed_ct
        start_step = min(int(np.asarray(state.step)), ct_steps)
        rows = [r for r in rows if r['step'] < start_step]
        stamp(f'ct: resumed full train state at step {start_step}')

    def ct_chunk_step(st, batch, rng, preds):
        # scanned phase-1 step: the rec program is OFF below rec_on_step,
        # so the plain fused step is exactly the per-step path's program
        return trainer._train_step(st, batch, preds, rng)

    t0 = time.time()
    ct_done0 = start_step
    if start_step < rec_on_step and time_left() > 600:
        ct_runner = ChunkRunner(ct_chunk_step, make_ct_batch,
                                batch_seed=1_000_000)

        def ct_per_step(st, step):
            # host_step=step keeps the rec program out of phase 1 (the
            # schedule weight is 0.0 below rec_on_step)
            return trainer.train_step(
                st, make_ct_batch(jax.random.PRNGKey(1_000_000 + step)),
                frozen_preds, jax.random.PRNGKey(step), step)

        state, rows, trips = train_family(
            'ct', state_path, ct_runner, state, start_step, rec_on_step,
            chunk_size=chunk, record_every=250, rows=rows,
            save_every=2500, floor=420, per_step=ct_per_step,
            extra_args=(frozen_preds,))
        finite_trips += trips
    cur = int(np.asarray(state.step))
    # rec_img tail: per-step split programs (fused-with-scan would be the
    # compile size class the relay drops; the split halves are warm-seeded)
    if cur >= rec_on_step and cur < ct_steps and time_left() > 420:
        import jax.numpy as _jnp
        finite_acc = _jnp.zeros((), _jnp.int32)
        for step in range(cur, ct_steps):
            if step == cur or step == rec_on_step:
                state, m = retry_compile(trainer.train_step, state,
                                         ct_batch(step), frozen_preds,
                                         jax.random.PRNGKey(step), step)
            else:
                state, m = trainer.train_step(state, ct_batch(step),
                                              frozen_preds,
                                              jax.random.PRNGKey(step),
                                              step)
            finite_acc = finite_acc + (1 - m['finite'].astype(_jnp.int32))
            if step % 250 == 0 or step == ct_steps - 1:
                rows.append({'step': step,
                             **{k: float(v) for k, v in m.items()}})
            if step % 1000 == 999 or step == ct_steps - 1:
                save_train_state(state_path, state, rows)
            if time_left() < 300:
                stamp('ct: deadline pressure in rec tail — stopping '
                      '(resumable)')
                save_train_state(state_path, state, rows)
                break
        finite_trips += int(finite_acc)
    dt = time.time() - t0
    ct_step_now = int(np.asarray(state.step))
    summary['ct'] = add_progress(work, 'ct', ct_step_now - ct_done0, dt,
                                 ct_step_now)
    summary['ct']['finite_trips_this_run'] = finite_trips
    if rows:
        summary['ct']['final'] = rows[-1]
    stamp(f'ct: {ct_step_now - ct_done0} steps this run in {dt:.0f}s '
          f'({(ct_step_now - ct_done0) / max(dt, 1e-9):.1f} steps/s), '
          f'finite-guard trips: {finite_trips}')
    save_checkpoint(ckpt_dir, jax.tree_util.tree_map(
        np.asarray, {'gen': state.gen.params,
                     'dis': state.dis.params}), ct_step_now, max_keep=3)
    with open(os.path.join(ART, 'ct_losses.json'), 'w') as f:
        json.dump(rows, f)
    if rows:
        plot_curves(rows, ['g_total', 'd_total', 'dz_total',
                           'g/lambda_rec', 'g/lambda_rgb',
                           'g/lambda_pca_std', 'g/lambda_cls_curliness',
                           'g/lambda_rec_img'],
                    os.path.join(ART, 'ct_losses.png'),
                    f'color_texture GAN soak (step {ct_step_now}, batch '
                    f'{ct_cfg.total_batch_size})')

    trained_ct_gen = jax.tree_util.tree_map(np.asarray, state.gen.params)
    trained_ct_dis = jax.tree_util.tree_map(np.asarray, state.dis.params)
    del state

    # ---------------- D: shape VAE-GAN on a generated warp pool, with a
    # KL free-bits floor (VERDICT r4 missing #2: 2k steps + plain KL
    # collapsed the hair latent — R^2 ~ 1e-4 on every statistic)
    from ctrlhair_tpu.data.shape_dataset import (ShapeDataset,
                                                 generate_warp_pool)
    from ctrlhair_tpu.training.shape_trainer import ShapeTrainer

    pool_dir = os.path.join(work, 'shape_training_wrap_pool')
    n_pool = generate_warp_pool(catalog, pool_dir, count=240,
                                num_threads=4, seed=0)
    stamp(f'warp pool: {n_pool} entries')

    kl_fb = float(os.environ.get('SOAK_KL_FREE_BITS', '0.25'))
    # Anti-collapse pair (r5: free-bits alone still left R^2 ~ 0 at 10k
    # steps): lambda_geo forces the posterior mean to linearly encode the
    # slider statistics; lambda_info (a reference-expressible option,
    # shape_branch/solver.py:143-144) forces the DECODER to respond to the
    # hair code, which is what the probe-delta gate measures.
    lam_geo = float(os.environ.get('SOAK_LAMBDA_GEO', '30.0'))
    lam_info = float(os.environ.get('SOAK_LAMBDA_INFO', '1.0'))
    # lambda_self_rec is the decode-from-MEAN pathway (no VAE noise): at
    # the reference weight 5 vs the 100-weight noisy-sampled recon, a
    # short-horizon decoder learns to ignore the hair code entirely
    # (r5 swap test: decode(z_A|f) == decode(z_B|f) bit-for-bit in area).
    # Raising it makes reading the code the cheapest way down.
    lam_self = float(os.environ.get('SOAK_LAMBDA_SELF_REC', '5.0'))
    # Moment matching on the AE hair code (reference options, solver.py:
    # 136-141): with E[z^2] pulled toward 0.973 while recon prefers
    # signal-in-mean over noise-in-std, second moment reallocates from the
    # posterior std to the mean — lifting the code to the amplitude range
    # where the decoder demonstrably responds (the lambda_info branch
    # recovers prior-scale codes, residual 0.74 at 15k, while data-scale
    # means ~0.3 produce zero output change).
    lam_m1 = float(os.environ.get('SOAK_LAMBDA_MOMENT_1', '0.0'))
    lam_m2 = float(os.environ.get('SOAK_LAMBDA_MOMENT_2', '0.0'))
    shape_cfg = dataclasses.replace(ShapeConfig(), total_step=shape_steps,
                                    kl_free_bits=kl_fb,
                                    lambda_geo=lam_geo,
                                    lambda_info=lam_info,
                                    lambda_self_rec=lam_self,
                                    lambda_moment_1=lam_m1,
                                    lambda_moment_2=lam_m2)
    sdataset = ShapeDataset(shape_cfg, work, catalog=catalog,
                            datasets=datasets)
    strainer = ShapeTrainer(shape_cfg)
    sstate = strainer.init_state(jax.random.PRNGKey(0))

    from ctrlhair_tpu.utils.masks import label_to_one_hot

    def _lab(path):
        a = np.asarray(Image.open(path)).astype(np.uint8)
        if a.shape[0] != shape_cfg.img_size:
            # pool composites are written at 512; cv2 INTER_NEAREST matches
            # ops.resize.resize_nearest (the dataset's device path)
            a = cv2.resize(a, (shape_cfg.img_size, shape_cfg.img_size),
                           interpolation=cv2.INTER_NEAREST)
        return a

    pool_tgt, pool_face, pool_hair = [], [], []
    for fname in sdataset.pool_files:
        parts = os.path.splitext(fname)[0].split('___')
        pool_tgt.append(_lab(os.path.join(sdataset.pool_dir, fname)))
        pool_hair.append(_lab(catalog.label_path(
            f'{parts[0]}___{parts[1]}')))
        pool_face.append(_lab(catalog.label_path(
            f'{parts[2]}___{parts[3]}')))
    real_np = np.stack([_lab(catalog.label_path(k))
                        for k in sdataset.real_keys])
    tgt_d = jnp.asarray(np.stack(pool_tgt))
    face_d = jnp.asarray(np.stack(pool_face))
    hair_d = jnp.asarray(np.stack(pool_hair))
    real_d = jnp.asarray(real_np)
    P, R = tgt_d.shape[0], real_d.shape[0]
    Bs = shape_cfg.total_batch_size

    @jax.jit
    def make_shape_batch(key):
        kp, kr, km, km2 = jax.random.split(key, 4)
        pidx = jax.random.randint(kp, (Bs,), 0, P)
        ridx = jax.random.randint(kr, (Bs,), 0, R)
        mir = jax.random.randint(km, (Bs,), 0, 2) == 1
        mir_r = jax.random.randint(km2, (Bs,), 0, 2) == 1

        def take_oh(arr, idx, m):
            lab = jnp.take(arr, idx, axis=0).astype(jnp.int32)
            lab = jnp.where(m[:, None, None], lab[:, :, ::-1], lab)
            return label_to_one_hot(lab)

        # the (target, face, hair) triplet shares one mirror bit per item
        # (ref: shape_branch/dataset.py mirror augment); real draws its own
        return {'target': take_oh(tgt_d, pidx, mir),
                'face': take_oh(face_d, pidx, mir),
                'hair': take_oh(hair_d, pidx, mir),
                'real': take_oh(real_d, ridx, mir_r)}

    srows = []
    s_ckpt = os.path.join(work, 'model_trained', 'shape', 'checkpoints')
    s_state_path = os.path.join(state_dir, 'shape.msgpack')
    s_start = 0
    resumed_s = load_train_state(s_state_path, sstate)
    if resumed_s is not None:
        sstate, srows = resumed_s
        s_start = min(int(np.asarray(sstate.step)), shape_steps)
        srows = [r for r in srows if r['step'] < s_start]
        stamp(f'shape: resumed full train state at step {s_start}')
    t0 = time.time()
    if s_start < shape_steps and time_left() > 480:
        s_runner = ChunkRunner(strainer._train_step, make_shape_batch,
                               batch_seed=2_000_000)

        def shape_per_step(st, step):
            return strainer.train_step(
                st, make_shape_batch(jax.random.PRNGKey(2_000_000 + step)),
                jax.random.PRNGKey(step))

        sstate, srows, _ = train_family(
            'shape', s_state_path, s_runner, sstate, s_start, shape_steps,
            chunk_size=chunk, record_every=250, rows=srows,
            save_every=5000, floor=360, per_step=shape_per_step)
    elif s_start < shape_steps:
        stamp(f'shape: skipped ({time_left():.0f}s left); resumable')
    dt = time.time() - t0
    s_step_now = int(np.asarray(sstate.step))
    summary['shape'] = add_progress(work, 'shape', s_step_now - s_start,
                                    dt, s_step_now)
    if srows:
        summary['shape']['final'] = srows[-1]
    stamp(f'shape: {s_step_now - s_start} steps this run in {dt:.0f}s '
          f'({(s_step_now - s_start) / max(dt, 1e-9):.1f} steps/s)')
    save_checkpoint(s_ckpt, jax.tree_util.tree_map(
        np.asarray, {'gen': sstate.gen.params}), s_step_now, max_keep=2)
    with open(os.path.join(ART, 'shape_losses.json'), 'w') as f:
        json.dump(srows, f)
    if srows:
        plot_curves(srows, ['g_total', 'd_total', 'dz_total',
                            'g/lambda_hair', 'g/lambda_face',
                            'g/lambda_kl', 'g/lambda_self_rec'],
                    os.path.join(ART, 'shape_losses.png'),
                    f'shape VAE-GAN soak (step {s_step_now}, batch '
                    f'{shape_cfg.total_batch_size}, '
                    f'free-bits {kl_fb})')
    trained_shape = jax.tree_util.tree_map(np.asarray, sstate.gen.params)
    # the lambda_geo head is a training-only artifact: strip it so the
    # shipped checkpoint restores into the inference generator's structure
    # (flax from_bytes is strict about extra keys)
    if 'geo_head' in trained_shape.get('params', {}):
        trained_shape = {'params': {k: v for k, v in
                                    trained_shape['params'].items()
                                    if k != 'geo_head'}}
    del sstate

    # ---------------- E: load trained branches + curate directions
    from ctrlhair_tpu.pipeline.backend import Backend
    from ctrlhair_tpu.pipeline.direction_finder import (
        check_directions_alive, data_driven_shape_directions,
        random_orthogonal_direction, save_direction)
    from ctrlhair_tpu.utils.image import read_rgb, write_rgb

    editor.params = dict(editor.params, ct_gen=jax.tree_util.tree_map(
        jnp.asarray, trained_ct_gen), ct_dis=jax.tree_util.tree_map(
        jnp.asarray, trained_ct_dis), shape=jax.tree_util.tree_map(
        jnp.asarray, trained_shape),
        rgb_pred=pred_params['rgb'],
        curliness_pred=pred_params['curliness'])
    editor.load_style_fallback(os.path.join(work, 'mean_style_code',
                                            'median'))
    with open(os.path.join(work, 'hsv_stat_dict_ordered.pkl'), 'rb') as f:
        hsv_table = pickle.load(f)
    be = Backend(blending=True, cfg=editor.cfg, editor=editor,
                 hsv_table=hsv_table, trained_root=None)
    src = '/root/reference/imgs'
    names = sorted(f for f in os.listdir(src) if f.endswith('.png'))
    be.set_input_img(read_rgb(os.path.join(src, names[0])))

    dir_done_path = os.path.join(state_dir, 'directions.json')
    install_root = (os.path.join(REPO, 'model_trained') if SHIP
                    else os.path.join(work, 'installed'))
    shape_dir_repo = os.path.join(install_root, 'shape_dir_used')
    tex_dir_repo = os.path.join(install_root, 'texture_dir_used')
    shape_dir_stage = os.path.join(work, 'staged', 'shape_dir_used')
    tex_dir_stage = os.path.join(work, 'staged', 'texture_dir_used')
    probe_min = float(os.environ.get('SOAK_PROBE_MIN', '0.05'))
    r2_min = float(os.environ.get('SOAK_R2_MIN', '0.3'))
    tex_min = float(os.environ.get('SOAK_TEX_MIN', '0.5'))

    # invalidate a stale curation marker when the nets changed this run
    nets_fresh = (summary['shape']['steps_this_run'] > 0
                  or summary['ct']['steps_this_run'] > 0
                  or summary['sean']['steps_this_run'] > 0)
    if nets_fresh and os.path.exists(dir_done_path):
        os.remove(dir_done_path)
        stamp('curation marker invalidated (nets trained this run)')

    if os.path.exists(dir_done_path):
        with open(dir_done_path) as f:
            _dd = json.load(f)
        summary.update({k: _dd[k] for k in (
            'shape_dirs', 'texture_dir_response', 'shape_dir_regression',
            'shape_dirs_alive', 'texture_dirs_alive') if k in _dd})
        stamp('directions already curated (marker found); skipping rescore')
    else:
        # shape directions from DATA: ridge-regress warp-pool latents on
        # mask geometry (the r4 random-probe method scored ~0 on every
        # statistic — the decoder's responsive subspace is narrow)
        base_shape = be.cur_latent.shape
        face_code = be.cur_latent.face

        def mask_stats(shape_vec):
            m = np.asarray(editor.decode_mask(
                editor.params, jnp.asarray(shape_vec, jnp.float32),
                face_code))[0]
            hair = m == HAIR_IDX
            area = hair.mean()
            rows_nz = np.nonzero(hair.any(axis=1))[0]
            length = (rows_nz[-1] / m.shape[0]) if rows_nz.size else 0.0
            forehead = hair[int(0.30 * 256):int(0.42 * 256),
                            int(0.35 * 256):int(0.65 * 256)].mean()
            half = m.shape[1] // 2
            asym = hair[:, :half].mean() - hair[:, half:].mean()
            # column order matches SHAPE_SLOTS' own statistics:
            # volume=area, length=length, bangs=forehead,
            # bangs_direction=asym
            return np.array([area, length, forehead, asym])

        shutil.rmtree(shape_dir_stage, ignore_errors=True)
        dirs, reg_report = data_driven_shape_directions(
            editor, editor.params, pool_dir, max_masks=200,
            save_dir=shape_dir_stage,
            report_path=os.path.join(ART, 'shape_dir_regression.json'))
        summary['shape_dir_regression'] = [
            {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in r.items()} for r in reg_report]
        sem_names = ['length', 'volume', 'bangs_direction', 'bangs']
        stat_names = ['volume', 'length', 'bangs', 'bangs_direction']
        summary['shape_dirs'] = {}
        probe_deltas = {}
        for slot, name in enumerate(sem_names):
            d = dirs[slot]
            lo = mask_stats(base_shape - 2.0 * d[None])
            hi = mask_stats(base_shape + 2.0 * d[None])
            delta = hi - lo
            summary['shape_dirs'][name] = [round(float(v), 4)
                                           for v in delta]
            probe_deltas[name] = {stat_names[i]: float(delta[i])
                                  for i in range(4)}
        failures = check_directions_alive(reg_report, probe_deltas,
                                          r2_min=r2_min,
                                          probe_min=probe_min)
        summary['shape_dirs_alive'] = not failures
        if failures:
            summary['shape_dir_failures'] = failures
            stamp('shape directions FAILED the liveliness gate — repo '
                  'pickles left untouched:\n  ' + '\n  '.join(failures))
        else:
            for i, d in enumerate(dirs):
                save_direction(shape_dir_repo, i, d)
            stamp(f'shape directions ALIVE and installed; '
                  f'r2={[round(r["r2"], 3) for r in reg_report]}; '
                  f'probe deltas={summary["shape_dirs"]}')

        # texture directions: orthogonal candidates ranked by rendered
        # hair-pixel response through the TRAINED SEAN
        rng2 = np.random.default_rng(11)
        base = be.cur_latent

        def tex_response(d):
            outs = []
            for v in (-2.0, 2.0):
                lat = base.replace(texture=base.texture + v * d[None])
                img = np.asarray(be.output(lat)).astype(np.float32)
                outs.append(img)
            return float(np.abs(outs[1] - outs[0]).mean())

        cand_pool = []
        for _ in range(8):
            cand_pool.append(random_orthogonal_direction(8, cand_pool,
                                                         rng2))
        responses = [tex_response(d) for d in cand_pool]
        order = np.argsort(-np.asarray(responses))
        shutil.rmtree(tex_dir_stage, ignore_errors=True)
        for i, idx in enumerate(order[:2]):
            save_direction(tex_dir_stage, i,
                           cand_pool[idx].astype(np.float32))
        summary['texture_dir_response'] = [round(responses[i], 3)
                                           for i in order[:2]]
        tex_alive = all(responses[i] >= tex_min for i in order[:2])
        summary['texture_dirs_alive'] = bool(tex_alive)
        if tex_alive:
            for i, idx in enumerate(order[:2]):
                save_direction(tex_dir_repo, i,
                               cand_pool[idx].astype(np.float32))
            stamp(f'texture directions ALIVE and installed (responses '
                  f'{summary["texture_dir_response"]})')
        else:
            stamp(f'texture directions below response floor {tex_min} '
                  f'({summary["texture_dir_response"]}) — repo pickles '
                  'left untouched')
        with open(dir_done_path, 'w') as f:
            json.dump({k: summary[k] for k in (
                'shape_dirs', 'shape_dir_regression', 'shape_dirs_alive',
                'texture_dir_response', 'texture_dirs_alive') if k in
                summary}, f)

    # ---------------- F: validation canvases + evidence grids.
    # Staleness by INPUT FINGERPRINT (ADVICE r4): each artifact records a
    # hash of the net states + shipped pickles it was rendered from; it is
    # re-rendered whenever the stored fingerprint mismatches — including
    # across crash/resume boundaries the old changed-within-this-process
    # logic missed.
    from ctrlhair_tpu.training import validation as V

    def render_fp():
        h = hashlib.sha1()
        for p in (state_path, s_state_path, sean_state_path):
            if os.path.exists(p):
                st = os.stat(p)
                h.update(f'{p}:{st.st_size}:{st.st_mtime_ns};'.encode())
        h.update(_dir_hash(shape_dir_repo).encode())
        h.update(_dir_hash(tex_dir_repo).encode())
        return h.hexdigest()

    FP = render_fp()

    def ensure_rendered(path, render_fn):
        side = path + '.fp'
        if (os.path.exists(path) and os.path.exists(side)
                and open(side).read() == FP):
            return False
        render_fn()
        with open(side, 'w') as f:
            f.write(FP)
        stamp(f'rendered {os.path.relpath(path, REPO)}')
        return True

    res = editor.analyze_image(np.asarray(be.input_img))
    lat = res['latent']
    base_data = {'noise': lat.texture,
                 'noise_curliness': lat.curliness,
                 'rgb_mean': lat.rgb_mean(), 'pca_std': lat.pca_std}
    ensure_rendered(
        os.path.join(ART, 'ct_sweep_canvas.png'),
        lambda: V.ct_latent_sweep_canvas(
            editor, editor.params['ct_gen'], res['sean_codes'],
            res['label'], base_data,
            out_path=os.path.join(ART, 'ct_sweep_canvas.png'),
            values=(-2.0, -1.0, 0.0, 1.0, 2.0)))
    ensure_rendered(
        os.path.join(ART, 'shape_sweep_canvas.png'),
        lambda: V.shape_sweep_canvas(
            editor, editor.params['shape'], lat.face, lat.shape,
            out_path=os.path.join(ART, 'shape_sweep_canvas.png'),
            values=(-2.0, 0.0, 2.0), dims=(0, 1, 2, 3)))

    # slider grids for the SHIPPED directions (evidence for curation) —
    # a fresh Backend picks up the repo pickles
    be2 = Backend(blending=True, cfg=editor.cfg, editor=editor,
                  hsv_table=hsv_table, trained_root=None)
    grid_dir = os.path.join(ART, 'direction_grids')
    os.makedirs(grid_dir, exist_ok=True)

    def render_grid(out_png, change, i):
        def _render():
            imgs = []
            for v in (-2.0, -1.0, 0.0, 1.0, 2.0):
                be2.set_input_img(read_rgb(os.path.join(src, names[0])))
                getattr(be2, change)(v, i)
                imgs.append(be2.output())
            write_rgb(out_png, np.concatenate(imgs, axis=1))
        return _render

    for i in range(4):
        out_png = os.path.join(grid_dir, f'shape_dir{i}.png')
        ensure_rendered(out_png, render_grid(out_png, 'change_shape', i))
    for i in range(2):
        out_png = os.path.join(grid_dir, f'texture_dir{i}.png')
        ensure_rendered(out_png, render_grid(out_png, 'change_texture', i))

    # ---------------- G: ship deployment checkpoints into the repo tree.
    # Small families are committed; sean/shape are written but gitignored
    # (534/482 MB bf16 — the same reason the reference's model_trained/ is
    # distributed out-of-band).  Backend(trained_root='auto') then boots
    # every family that exists on disk.
    ship_root = install_root

    def ship(family, tree, step, cast_bf16=False):
        tree = jax.tree_util.tree_map(np.asarray, tree)
        if cast_bf16:
            import ml_dtypes
            tree = jax.tree_util.tree_map(
                lambda x: x.astype(ml_dtypes.bfloat16)
                if np.issubdtype(x.dtype, np.floating) else x, tree)
        save_checkpoint(os.path.join(ship_root, family, 'checkpoints'),
                        tree, step, max_keep=1)
        stamp(f'shipped {family} (step {step}'
              f'{", bf16" if cast_bf16 else ""})')

    ship('color_texture', {'gen': trained_ct_gen, 'dis': trained_ct_dis},
         ct_step_now)
    ship('shape', {'gen': trained_shape}, s_step_now, cast_bf16=True)
    ship('bisenet', bn_variables, bn_step_now)
    ship('color_encoder', pred_params['rgb'], 2000)
    ship('curliness_classifier', pred_params['curliness'], 2000)
    if sean_step_now > 0:
        ship('sean', jax.tree_util.tree_map(np.asarray,
                                            editor.params['sean']),
             sean_step_now, cast_bf16=True)
    # dataset-stats contracts the Backend needs at boot
    shutil.copy(os.path.join(work, 'hsv_stat_dict_ordered.pkl'),
                os.path.join(ship_root, 'hsv_stat_dict_ordered.pkl'))
    median_src = os.path.join(work, 'mean_style_code', 'median')
    median_dst = os.path.join(ship_root, 'mean_style_code', 'median')
    if os.path.isdir(median_src):
        shutil.rmtree(median_dst, ignore_errors=True)
        shutil.copytree(median_src, median_dst)
    stamp('deployment tables shipped (hsv CDF + median style codes)')

    summary['total_seconds_this_run'] = round(time.time() - t00, 1)
    tmp = os.path.join(ART, 'summary.json.tmp')
    with open(tmp, 'w') as f:
        json.dump(summary, f, indent=2)
    os.replace(tmp, os.path.join(ART, 'summary.json'))
    stamp(f'SOAK DONE -> {ART}')
    ok = summary.get('shape_dirs_alive', False)
    print('SOAK PASS' if ok else
          'SOAK FAIL: shape directions did not pass the liveliness gate',
          flush=True)
    # exit 2 = ran to completion but the gate failed: the supervisor must
    # NOT relaunch (a rerun would deterministically fail again); any other
    # nonzero rc is a crash worth relaunching into a resume
    sys.exit(0 if ok else 2)


if __name__ == '__main__':
    main()
