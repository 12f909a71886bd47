# The editing core: one functional, fully-jitted pipeline over all models.
#
# TPU-native replacement for the reference HairEditor (ref: hair_editor.py:40-
# 335) and the GPU half of Backend.parse_img/output (ref: ui/backend.py:67-175).
# Design differences, on purpose:
#   * no 'status' strings or module walking (ref: hair_editor.py:34-37) —
#     encode/decode are separate pure functions;
#   * analysis (parse -> shape codes -> SEAN codes -> colour/texture latents)
#     compiles into ONE XLA program instead of four separate networks with
#     host round-trips between them (ref call stack: SURVEY §3.1);
#   * editing+rendering(+blending) is another single program, so a full edit
#     is two device launches (or one, for latent-only edits);
#   * median style-code fallback (ref: hair_editor.py:130-147 reloads 19 .npy
#     from disk per call) is a static [19,512] constant applied with a where.

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ctrlhair_tpu.config import PipelineConfig
from ctrlhair_tpu.constants import (
    BACKGROUND_IDX, HAIR_IDX, NUM_CLASSES)
from ctrlhair_tpu.models.bisenet import BiSeNet, normalize_imagenet
from ctrlhair_tpu.models.color_texture import (
    CTDiscriminator, Predictor, make_generator)
from ctrlhair_tpu.models.sean import SEAN
from ctrlhair_tpu.models.shape import ShapeGenerator
from ctrlhair_tpu.ops.morphology import dilate
from ctrlhair_tpu.ops.poisson import poisson_blend
from ctrlhair_tpu.ops.resize import (
    resize_bilinear_nhwc, resize_nearest)
from ctrlhair_tpu.pipeline.latent import Latent
from ctrlhair_tpu.pipeline.latent import interpolate as latent_interpolate
from ctrlhair_tpu.utils.colorspace import rgb_to_hsv_u8
from ctrlhair_tpu.utils.masks import (
    label_to_one_hot, one_hot_to_label, split_hair_face)


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Persistent XLA compilation cache: first-run compiles of the fused
    pipeline programs take minutes over the device tunnel; cached reloads
    take seconds.  Safe to call multiple times.  Skipped on CPU: XLA:CPU AOT
    artifacts encode exact machine features and can SIGILL when replayed on
    a different host."""
    try:
        if jax.default_backend() == 'cpu':
            return
        if path is None:
            path = os.environ.get('CTRLHAIR_XLA_CACHE',
                                  '/tmp/ctrlhair_xla_cache')
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    except Exception:
        pass


class HairEditorTPU:
    """Holds model defs + params and exposes jitted pipeline stages."""

    def __init__(self, cfg: PipelineConfig = PipelineConfig(),
                 params: Optional[Dict[str, Any]] = None, seed: int = 0,
                 compilation_cache: bool = True,
                 warm_batches: Optional[Tuple[int, ...]] = None):
        """warm_batches: batch sizes to warm the interactive programs for
        on a background thread started right after parameter init (the
        dispatch path is what hits the persistent compilation cache, and
        this environment's remote-compile service serializes concurrent
        compiles anyway — see warm_start).  Call join_warm() to block until
        the warm compiles land."""
        if compilation_cache:
            enable_compilation_cache()
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == 'bfloat16' else jnp.float32
        self.sean = SEAN(cfg.sean, dtype=dtype)
        self.bisenet = BiSeNet(cfg.bisenet, dtype=dtype)
        self.shape_gen = ShapeGenerator(cfg.shape, dtype=dtype)
        self.ct_gen = make_generator(cfg.color_texture)
        self.ct_dis = CTDiscriminator(cfg.color_texture)
        self.rgb_pred = Predictor(cfg.rgb_predictor)
        self.curliness_pred = Predictor(cfg.curliness_predictor)
        self.params = None
        self._build_jitted()
        self._warm_threads = []
        if params is None:
            # warm-start: a saved initialised param tree skips the seven
            # init-program compiles (scripts/seed_cache.py writes it)
            from ctrlhair_tpu.utils.aot_cache import load_params
            params = load_params(self.params_cache_name(seed))
        self.params = params if params is not None else self.init_params(seed)
        if warm_batches:
            self._warm_threads = self.warm_start(
                batch_sizes=warm_batches, block=False)

    def params_cache_name(self, seed: int) -> str:
        """Warm-artifact key for the initialised params: seed + config."""
        import hashlib
        cfg_h = hashlib.sha1(repr(self.cfg).encode()).hexdigest()[:8]
        return f'editor_params_seed{seed}_{cfg_h}'

    def join_warm(self) -> None:
        for t in self._warm_threads:
            t.join()
        self._warm_threads = []

    # ------------------------------------------------------------------ init
    def _init_tasks(self, seed: int):
        """name -> zero-arg init callable, one jittable program each."""
        cfg = self.cfg
        k = jax.random.split(jax.random.PRNGKey(seed), 8)
        s = cfg.edit_size
        img = jnp.zeros((1, s, s, 3), jnp.float32)
        label = jnp.zeros((1, s, s), jnp.int32)
        img512 = jnp.zeros((1, cfg.bisenet.input_size,
                            cfg.bisenet.input_size, 3), jnp.float32)
        oh = label_to_one_hot(label)
        hair, face = split_hair_face(oh)
        code = {'code': jnp.zeros((1, cfg.sean.style_dim), jnp.float32)}
        ct_data = {
            'noise': jnp.zeros((1, cfg.color_texture.noise_dim)),
            'noise_curliness': jnp.zeros((1, 1)),
            'rgb_mean': jnp.zeros((1, 3)),
            'pca_std': jnp.zeros((1, 1)),
        }
        jinit = lambda m: jax.jit(m.init)  # compile init: one XLA program
        # (fn, key) pairs: the key is passed as the (abstract-able) argument
        # so param_shapes can jax.eval_shape these without running them
        return {
            'sean': (lambda kk: jinit(self.sean)(kk, img, label), k[0]),
            'bisenet': (lambda kk: jinit(self.bisenet)(kk, img512), k[1]),
            'shape': (lambda kk: jinit(self.shape_gen)(kk, hair, face), k[2]),
            'ct_gen': (lambda kk: jinit(self.ct_gen)(kk, ct_data), k[3]),
            'ct_dis': (lambda kk: jinit(self.ct_dis)(kk, code), k[4]),
            'rgb_pred': (lambda kk: jinit(self.rgb_pred)(kk, code), k[5]),
            'curliness_pred': (
                lambda kk: jinit(self.curliness_pred)(kk, code), k[6]),
        }

    def param_shapes(self, seed: int = 0) -> Dict[str, Any]:
        """The parameter pytree as ShapeDtypeStructs — no compile, no data;
        enough to AOT-lower every pipeline program before init finishes."""
        shapes = {name: jax.eval_shape(fn, key)
                  for name, (fn, key) in self._init_tasks(seed).items()}
        shapes['style_fallback'] = jax.ShapeDtypeStruct(
            (NUM_CLASSES, self.cfg.sean.style_dim), jnp.float32)
        return shapes

    def init_params(self, seed: int = 0) -> Dict[str, Any]:
        tasks = self._init_tasks(seed)
        # the seven init compiles are independent: overlap them (XLA compile
        # releases the GIL; measured ~1.6x for 2 threads, more for 7)
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=len(tasks)) as ex:
            futs = {name: ex.submit(fn, key)
                    for name, (fn, key) in tasks.items()}
            params = {name: f.result() for name, f in futs.items()}
        # median per-region style codes (ref: hair_editor.py:130-147);
        # zeros mean "no fallback available".
        params['style_fallback'] = jnp.zeros(
            (NUM_CLASSES, self.cfg.sean.style_dim), jnp.float32)
        return params

    def load_style_fallback(self, folder: str) -> None:
        """Load per-class median ACE codes from <folder>/<class>/ACE.npy.

        Codes whose dimension does not match this config's style_dim are
        skipped with a warning instead of failing init — the shipped
        deployment tables are full-size, and a reduced-config editor (tests,
        experiments) pointed at the same trained root must still construct."""
        codes = np.zeros((NUM_CLASSES, self.cfg.sean.style_dim), np.float32)
        for i in range(NUM_CLASSES):
            path = os.path.join(folder, str(i), 'ACE.npy')
            if os.path.exists(path):
                code = np.load(path)
                if code.shape != codes[i].shape:
                    import warnings
                    warnings.warn(
                        f'style fallback {path}: shape {code.shape} != '
                        f'configured {codes[i].shape}; skipping',
                        stacklevel=2)
                    continue
                codes[i] = code
        self.params = dict(self.params, style_fallback=jnp.asarray(codes))

    # ------------------------------------------------------------- functional
    def _parse(self, params, img_u8: jnp.ndarray) -> jnp.ndarray:
        """[N, S, S, 3] uint8 (any size) -> [N, 512, 512] CelebA label map."""
        x = img_u8.astype(jnp.float32)
        size = self.cfg.bisenet.input_size
        if x.shape[1] != size or x.shape[2] != size:
            # quantise back to the uint8 grid: the reference feeds the parser
            # a PIL-resized uint8 image (ref: my_parsing_util.py:34), so the
            # 512px input is always integer-valued
            x = jnp.round(resize_bilinear_nhwc(x, (size, size),
                                               align_corners=False))
        x = normalize_imagenet(x / 255.0)
        logits = self.bisenet.apply(params['bisenet'], x)
        # channel permutation before argmax == label remap after argmax
        # (bijective map; avoids a [N,512,512] gather, which crawls on TPU)
        from ctrlhair_tpu.constants import CELEBA_TO_BISENET
        logits = logits[..., jnp.asarray(CELEBA_TO_BISENET)]
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def _analyze(self, params, img_u8_256: jnp.ndarray,
                 img_u8_512: jnp.ndarray):
        """Full image analysis in one program (ref: ui/backend.py:67-106)."""
        label512 = self._parse(params, img_u8_512)
        return self._analyze_tail(params, img_u8_256, label512)

    def _analyze_tail(self, params, img_u8_256: jnp.ndarray,
                      label512: jnp.ndarray):
        """Analysis downstream of the parser.  Jitted separately as well:
        the interactive batch-1 path runs parse and tail as TWO programs —
        each is a much smaller (faster, more reliably cached) compile than
        the fused giant, and they chain on the device queue with no host
        sync between, so steady-state cost is unchanged.  The fused
        `analyze` stays the batched-throughput path."""
        cfg = self.cfg
        label = resize_nearest(label512, (cfg.edit_size, cfg.edit_size))

        oh = label_to_one_hot(label)
        hair, face = split_hair_face(oh)
        _, shape_code, _ = self.shape_gen.apply(
            params['shape'], hair, method=self.shape_gen.encode_hair)
        face_code = self.shape_gen.apply(
            params['shape'], face, method=self.shape_gen.encode_face)
        regen_mask = self.shape_gen.apply(
            params['shape'], shape_code, face_code,
            method=self.shape_gen.decode)
        regen_label = one_hot_to_label(regen_mask)

        img_f = img_u8_256.astype(jnp.float32) / 127.5 - 1.0
        sean_codes = self.sean.apply(params['sean'], img_f, label,
                                     method=self.sean.encode
                                     ).astype(jnp.float32)
        hair_feature = sean_codes[:, HAIR_IDX]

        color = self.rgb_pred.apply(params['rgb_pred'],
                                    {'code': hair_feature})
        rgb_u8 = jnp.clip(jnp.round(color['rgb_mean']), 0, 255)
        hsv = rgb_to_hsv_u8(rgb_u8).astype(jnp.float32)

        enc = self.ct_dis.apply(params['ct_dis'], {'code': hair_feature})
        # public latent dtype is f32 regardless of compute_dtype: edits and
        # warm-start executable signatures (utils/aot_cache.py) need ONE
        # stable dtype across analyze -> edit -> output
        f32 = lambda x: x.astype(jnp.float32)
        latent = Latent(hsv=f32(hsv), pca_std=f32(color['pca_std']),
                        curliness=f32(enc['noise_curliness']),
                        texture=f32(enc['noise']), shape=f32(shape_code),
                        face=f32(face_code))
        return {
            'label512': label512, 'label': label, 'regen_label': regen_label,
            'sean_codes': sean_codes, 'hair_feature': hair_feature,
            'latent': latent,
        }

    def _decode_mask(self, params, shape_code, face_code):
        mask = self.shape_gen.apply(params['shape'], shape_code, face_code,
                                    method=self.shape_gen.decode)
        return one_hot_to_label(mask)

    def _encode_shape(self, params, label):
        """[N,S,S] label -> (shape_code [N,16], face_code [N,1024]) as ONE
        program (eager flax apply dispatches each conv separately —
        ~0.5 s through the device relay)."""
        oh = label_to_one_hot(label)
        hair, face = split_hair_face(oh)
        _, shape_code, _ = self.shape_gen.apply(
            params['shape'], hair, method=self.shape_gen.encode_hair)
        face_code = self.shape_gen.apply(
            params['shape'], face, method=self.shape_gen.encode_face)
        # f32 at the boundary: see _analyze_tail's latent note
        return (shape_code.astype(jnp.float32),
                face_code.astype(jnp.float32))

    def _feature(self, params, latent: Latent) -> jnp.ndarray:
        """latent -> 512-d hair style code (ref: ui/backend.py:161-169)."""
        data = {'noise': latent.texture,
                'noise_curliness': latent.curliness,
                'rgb_mean': latent.rgb_mean(),
                'pca_std': latent.pca_std}
        return self.ct_gen.apply(params['ct_gen'], data)['code']

    def _render(self, params, sean_codes: jnp.ndarray,
                label: jnp.ndarray) -> jnp.ndarray:
        """codes [N,19,512] + label [N,S,S] -> image [-1,1] NHWC."""
        fallback = params['style_fallback'][None]
        has_code = jnp.any(sean_codes != 0, axis=-1, keepdims=True)
        codes = jnp.where(has_code, sean_codes, fallback)
        return self.sean.apply(params['sean'], label, codes,
                               method=self.sean.decode)

    def _blend(self, params, face_img_u8, gen_img_f, face_label,
               target_label):
        """Poisson-blend generated hair onto the original face
        (ref: hair_editor.py:257-310)."""
        gen_u8f = gen_img_f * 127.5 + 127.5
        res_mask = jnp.logical_or(target_label == HAIR_IDX,
                                  face_label == HAIR_IDX).astype(jnp.float32)
        d13 = dilate(res_mask, 13)
        d5 = dilate(res_mask, 5)
        bg = (target_label == BACKGROUND_IDX).astype(jnp.float32)
        res_dil = d13 * (1 - bg) + d5 * bg
        blend_mask = 1.0 - res_dil

        if self.cfg.use_pallas_blend:
            from ctrlhair_tpu.ops.poisson_pallas import poisson_blend_fused
            out = poisson_blend_fused(
                face_img_u8.astype(jnp.float32), gen_u8f, blend_mask,
                iterations=self.cfg.poisson_iterations)
        else:
            def one(face_img, gen, m):
                return poisson_blend(face_img.astype(jnp.float32), gen, m,
                                     iterations=self.cfg.poisson_iterations)
            out = jax.vmap(one)(face_img_u8, gen_u8f, blend_mask)
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)

    def _edit_render(self, params, sean_codes, label, latent: Latent,
                     feature: Optional[jnp.ndarray] = None):
        """Latent -> feature -> hair-code swap -> SEAN render
        (ref: ui/backend.py:147-175, no blending)."""
        if feature is None:
            feature = self._feature(params, latent)
        codes = sean_codes.at[:, HAIR_IDX].set(feature)
        return self._render(params, codes, label)

    def _output(self, params, sean_codes, latent: Latent, face_img_u8,
                face_label, target_label):
        """Full edit: mask refresh + render + blend, one XLA program."""
        img = self._edit_render(params, sean_codes, target_label, latent)
        return self._blend(params, face_img_u8, img, face_label, target_label)

    def _output_refresh(self, params, sean_codes, latent: Latent,
                        face_img_u8, face_label):
        """Shape-editing tick: decode the mask FROM the latent, render and
        blend under it — one program, one host sync, vs the reference's
        decoder/generator/blend round trips (ref: ui/backend.py:155-175).
        Returns (edited image, decoded label)."""
        label = self._decode_mask(params, latent.shape, latent.face)
        return self._output(params, sean_codes, latent, face_img_u8,
                            face_label, label), label

    def _output_sweep(self, params, sean_codes, l1: Latent, l2: Latent,
                      alphas, face_img_u8, face_label, target_label):
        """BASELINE config 5 as ONE program: interpolate N latents between
        two endpoints and render+blend every step against a single input.

        All image-sized inputs stay batch-1 (plus the [N] alpha vector);
        the broadcast to N happens inside the traced program, so a sweep
        costs one dispatch with no host-side tiling, re-upload, or per-alpha
        interpolate dispatches.  The reference renders each alpha through a
        separate backend call (ref: ui/backend.py:343-358 + :147-175)."""
        n = alphas.shape[0]
        lat = latent_interpolate(l1, l2, alphas[:, None])
        bcast = lambda x: jnp.broadcast_to(x, (n,) + x.shape[1:])
        lat = jax.tree_util.tree_map(bcast, lat)
        return self._output(params, bcast(sean_codes), lat,
                            bcast(face_img_u8), bcast(face_label),
                            bcast(target_label))

    # --------------------------------------------------------------- jitting
    def _build_jitted(self):
        # WarmJit = jax.jit + optional pre-serialized executables for the
        # interactive batch-1 signatures (scripts/seed_cache.py writes
        # them; deserialization is ~0.1 s vs minutes of remote compile —
        # see utils/aot_cache.py)
        from ctrlhair_tpu.utils.aot_cache import WarmJit
        self.analyze = jax.jit(self._analyze)
        self.analyze_tail = WarmJit('analyze_tail', self._analyze_tail)
        self.parse = WarmJit('parse', self._parse)
        self.decode_mask = WarmJit('decode_mask', self._decode_mask)
        self.encode_shape = WarmJit('encode_shape', self._encode_shape)
        self.feature = jax.jit(self._feature)
        self.render = jax.jit(self._render)
        self.edit_render = jax.jit(self._edit_render)
        self.blend = jax.jit(self._blend)
        self.output = WarmJit('output', self._output)
        self.output_sweep = jax.jit(self._output_sweep)
        self.output_refresh = WarmJit('output_refresh',
                                      self._output_refresh)

    # ------------------------------------------------------------ warm start
    def warm_start(self, batch_sizes: Tuple[int, ...] = (1,),
                   block: bool = True):
        """Warm every interactive program ahead of first real use.

        Runs each (program, batch) pair on zero-filled inputs through the
        normal dispatch path — the dispatch path is what consults the
        persistent compilation cache, so on a previously-seen machine this
        is pure deserialization.  (An AOT .lower().compile() variant was
        measured to bypass the persistent cache, and CONCURRENT compiles
        degrade super-linearly on the remote-compile relay — 6 threaded
        jobs took 3.7x the sequential total — so warming is sequential, on
        one background thread when block=False.)  The reference has no
        analog — its first edit pays the full model load
        (ref: hair_editor.py:45-119).  Returns the list of threads when
        block=False so a UI can start serving while warming.
        """
        import threading

        s = self.cfg.edit_size
        params = self.params

        def lat(b):
            return Latent(hsv=jnp.zeros((b, 3), jnp.float32),
                          pca_std=jnp.zeros((b, 1), jnp.float32),
                          curliness=jnp.zeros((b, 1), jnp.float32),
                          texture=jnp.zeros(
                              (b, self.cfg.color_texture.noise_dim),
                              jnp.float32),
                          shape=jnp.zeros((b, self.cfg.shape.hair_dim),
                                          jnp.float32),
                          face=jnp.zeros((b, self.cfg.shape.face_dim),
                                         jnp.float32))

        jobs = []
        for b in batch_sizes:
            codes = jnp.zeros((b, NUM_CLASSES, self.cfg.sean.style_dim),
                              jnp.float32)
            img256 = jnp.zeros((b, s, s, 3), jnp.uint8)
            label = jnp.zeros((b, s, s), jnp.int32)
            jobs.append((self.output,
                         (params, codes, lat(b), img256, label, label)))
            jobs.append((self.output_refresh,
                         (params, codes, lat(b), img256, label)))
            jobs.append((self.decode_mask,
                         (params, lat(b).shape, lat(b).face)))
            # parse input is canonical (512px, host-resized in
            # analyze_image) — ONE signature per batch regardless of the
            # caller's image size
            psz = self.cfg.bisenet.input_size
            imgP = jnp.zeros((b, psz, psz, 3), jnp.uint8)
            label512 = jnp.zeros((b, psz, psz), jnp.int32)
            if b == 1:
                # the interactive path is parse + tail (two small
                # programs, see analyze_image)
                jobs.append((self.parse, (params, imgP)))
                jobs.append((self.analyze_tail,
                             (params, img256, label512)))
            else:
                jobs.append((self.analyze, (params, img256, imgP)))

        def run_all():
            for f, a in jobs:
                jax.block_until_ready(f(*a))

        if block:
            run_all()
            return []
        t = threading.Thread(target=run_all, daemon=True)
        t.start()
        return [t]

    # ----------------------------------------------------------- convenience
    def _to_parse_size(self, img_rgb: np.ndarray) -> np.ndarray:
        """Host-side resize of ANY input to the canonical parse resolution
        (512px, matching the reference's fixed parse input,
        ref: my_parsing_util.py:34) before upload.

        One canonical size means ONE parse program signature covers every
        source — 256px samples, 1024px photos, web uploads — so the warm
        serialized executable (utils/aot_cache.py) always hits instead of
        recompiling through the relay (VERDICT r3 item 6).  cv2
        INTER_LINEAR computes the same bilinear _parse would apply on
        device (same align_corners=False sampling; the only difference is
        this path's re-quantisation to uint8, <=0.5/255), and shipping
        512px instead of 1024px quarters the uplink."""
        size = self.cfg.bisenet.input_size
        if img_rgb.shape[0] == size and img_rgb.shape[1] == size:
            return img_rgb
        try:
            import cv2
            out = cv2.resize(img_rgb.astype(np.float32), (size, size),
                             interpolation=cv2.INTER_LINEAR)
            return np.clip(np.rint(out), 0, 255).astype(np.uint8)
        except ImportError:
            return img_rgb   # device-side resize in _parse still applies

    def crop_face(self, img_rgb: np.ndarray,
                  output_size: Optional[int] = None) -> np.ndarray:
        """Align+crop a face to the edit resolution (ref: hair_editor.py:312-
        329); landmarks come from the parsing-centroid estimator instead of
        dlib."""
        import jax.numpy as jnp
        from ctrlhair_tpu.ops.crop import recreate_aligned_image
        from ctrlhair_tpu.ops.landmarks import estimate_landmarks_68

        label512 = np.asarray(
            self.parse(self.params,
                       jnp.asarray(self._to_parse_size(img_rgb))[None]
                       )[0].astype(jnp.uint8))   # u8: 4x less downlink
        # landmarks are normalised to the (squashed) parse square: x scales
        # by width, y by height
        lm68 = estimate_landmarks_68(label512.astype(np.int32),
                                     image=img_rgb) \
            * np.array([img_rgb.shape[1], img_rgb.shape[0]], np.float64)
        out, _ = recreate_aligned_image(
            img_rgb, lm68, output_size or self.cfg.edit_size)
        return out

    def get_hair_color(self, img_rgb: np.ndarray) -> np.ndarray:
        """Mean RGB over the eroded hair region at 1024px
        (ref: hair_editor.py:233-244)."""
        from ctrlhair_tpu.ops.morphology import erode
        from ctrlhair_tpu.ops.resize import resize_bilinear_nhwc, \
            resize_nearest

        label512 = self.parse(self.params,
                              jnp.asarray(self._to_parse_size(img_rgb))[None])
        label = resize_nearest(label512, (1024, 1024))[0]
        img = resize_bilinear_nhwc(
            jnp.asarray(img_rgb, jnp.float32)[None], (1024, 1024))[0]
        hair = erode((label == HAIR_IDX).astype(jnp.float32), 19)
        w = hair[..., None]
        mean = jnp.sum(img * w, axis=(0, 1)) / jnp.maximum(
            jnp.sum(w, axis=(0, 1)), 1.0)
        return np.asarray(mean)

    def generate_by_sean(self, face_codes: np.ndarray, hair_code: np.ndarray,
                         target_label: np.ndarray) -> np.ndarray:
        """Render with face codes + an overridden hair code
        (ref: hair_editor.py:181-206)."""
        codes = jnp.asarray(face_codes, jnp.float32)[None].at[
            :, HAIR_IDX].set(jnp.asarray(hair_code, jnp.float32)[None])
        img = self.render(self.params, codes,
                          jnp.asarray(target_label, jnp.int32)[None])
        return np.asarray(img[0])

    def generate_instance_transfer_img(self, face_img, face_label, hair_img,
                                       hair_label, target_label,
                                       edit_latent=None) -> np.ndarray:
        """Instance-level hair transfer: encode both images, swap the hair
        code (optionally re-generated from an edited latent), render
        (ref: hair_editor.py:208-231)."""
        enc = lambda im, lb: self.sean.apply(
            self.params['sean'],
            jnp.asarray(im, jnp.float32)[None] / 127.5 - 1.0,
            jnp.asarray(lb, jnp.int32)[None], method=self.sean.encode)
        face_codes = enc(face_img, face_label)
        hair_codes = (face_codes if hair_img is None
                      else enc(hair_img, hair_label))
        hair_code = hair_codes[0, HAIR_IDX]
        if edit_latent is not None:
            hair_code = self.feature(self.params, edit_latent)[0]
        return self.generate_by_sean(np.asarray(face_codes[0]),
                                     np.asarray(hair_code), target_label)

    def analyze_image(self, img_u8: np.ndarray, split: bool = True):
        """Host entry: arbitrary-size uint8 RGB -> analysis dict (batch 1).

        split=True runs parse and the analysis tail as two chained device
        programs (no host sync in between): each compiles in a fraction of
        the fused program's time, which bounds the interactive cold start.
        """
        s = self.cfg.edit_size
        img = jnp.asarray(img_u8)[None]
        img256 = img if img.shape[1:3] == (s, s) else jnp.clip(jnp.round(
            resize_bilinear_nhwc(img.astype(jnp.float32), (s, s))), 0, 255)
        img256 = img256.astype(jnp.uint8)
        # canonical parse signature: resize on host to the parser's 512px
        # input so every source shape dispatches the SAME parse program
        # (warm-artifact hit; the reference also feeds a fixed 512,
        # ref: my_parsing_util.py:34)
        img_parse = jnp.asarray(self._to_parse_size(img_u8))[None]
        if split:
            label512 = self.parse(self.params, img_parse)
            return self.analyze_tail(self.params, img256, label512)
        return self.analyze(self.params, img256, img_parse)
