# Stateful editing session — the public Backend API.
#
# Method-level parity with the reference Backend (ref: ui/backend.py:40-462):
# same names, same slider semantics (including the (val+max)/2/max*100+20
# pca_std mapping, ref :204-206), same transfer/interpolation contracts.  The
# heavy lifting is delegated to HairEditorTPU's fused jitted programs; this
# class only keeps session state and host-side glue.

from __future__ import annotations

import copy
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ctrlhair_tpu.config import PipelineConfig
from ctrlhair_tpu.constants import HAIR_IDX, SHAPE_DIM, TEXTURE_DIM
from ctrlhair_tpu.pipeline import latent as latent_ops
from ctrlhair_tpu.pipeline.editor import HairEditorTPU
from ctrlhair_tpu.pipeline.latent import Latent
from ctrlhair_tpu.utils.color_stats import DistTranslation
from ctrlhair_tpu.utils.image import mask_to_rgb
from ctrlhair_tpu.utils.masks import label_to_one_hot, split_hair_face


class Backend:
    """Interactive editing session (ref: ui/backend.py:40-462)."""

    @staticmethod
    def _repo_path(rel: str) -> str:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        return os.path.join(repo, rel)

    def __init__(self, maximum_value_fe: float = 2.5, blending: bool = True,
                 cfg: PipelineConfig = PipelineConfig(),
                 editor: Optional[HairEditorTPU] = None, seed: int = 0,
                 hsv_table=None, trained_root: Optional[str] = 'auto'):
        self.cfg = cfg
        self.editor = editor if editor is not None else HairEditorTPU(
            cfg, seed=seed)
        # deployment weights: when this Backend builds its own editor,
        # auto-load the checkout's shipped family checkpoints (the
        # reference boots from model_trained/ the same way,
        # ref: hair_editor.py:45-119).  Callers that pass an editor keep
        # full control (tests, the soak, bench) — pass trained_root
        # explicitly to opt in.
        if trained_root == 'auto':
            trained_root = (self._repo_path('model_trained')
                            if editor is None else None)
        if trained_root and os.path.isdir(trained_root):
            from ctrlhair_tpu.convert.load import load_trained_root
            load_trained_root(self.editor, trained_root)
            median = os.path.join(trained_root, 'mean_style_code', 'median')
            if os.path.isdir(median):
                self.editor.load_style_fallback(median)
        if hsv_table is None and trained_root:
            # dataset-stats contract: the HSV slider CDF table ships with
            # the trained weights (ref: dataset_info_ctrlhair/
            # hsv_stat_dict_ordered.pkl, color_from_hsv_to_gaussian.py:18)
            table_path = os.path.join(trained_root or '',
                                      'hsv_stat_dict_ordered.pkl')
            if os.path.exists(table_path):
                import pickle
                with open(table_path, 'rb') as f:
                    hsv_table = pickle.load(f)
        self.maximum_value_fe = maximum_value_fe
        self.blending = blending
        self.dist_translation = DistTranslation(table=hsv_table)
        # semantic directions: curated pickles if available (the reference's
        # texture_dir_used/shape_dir_used contract, hair_editor.py:82-119),
        # else deterministic orthonormal defaults (see latent.py)
        from ctrlhair_tpu.pipeline.direction_finder import load_directions

        def dirs(path, dim, n):
            """Curated directions, padded with deterministic orthonormal
            defaults up to the UI's fixed slider count (a partially-curated
            dir must not shrink the slider set).  A degenerate (near-zero)
            pickle is replaced slot-by-slot with the default: the slider
            semantics (projection set TO the slider value,
            ref: ui/backend.py:450-462) need unit-norm directions, and a
            zero vector would make its slider permanently dead."""
            loaded = load_directions(path) or []
            defaults = latent_ops.semantic_directions(dim, n)
            out = (list(loaded) + list(defaults))[:max(n, len(loaded))]
            for i, d in enumerate(out):
                if float(np.linalg.norm(np.asarray(d))) < 1e-3:
                    out[i] = np.asarray(defaults[i % len(defaults)])
            return out

        self.shape_dirs = dirs('model_trained/shape_dir_used', SHAPE_DIM, 4)
        self.texture_dirs = dirs('model_trained/texture_dir_used',
                                 TEXTURE_DIM, 2)
        self._rng = np.random.default_rng(seed)

        self._parse512 = {}            # 'input'/'target' -> [512,512] label
        self._parse512_np = {}         # host copies (filled with landmarks)
        self._lm81 = {}                # 'input'/'target' -> [81,2] or None
        self.input_img = None          # uint8 [256,256,3]
        self.target_img = None
        self.input_mask = None         # parsed label [256,256]
        self.target_mask = None
        self.cur_mask = None           # regenerated label [256,256] (lazy)
        self.cur_latent: Optional[Latent] = None
        self.target_latent: Optional[Latent] = None
        self.input_sean_code = None    # [1,19,512]
        self.input_hair_feature = None
        self._input_dev = None         # cached (img [1,S,S,3], mask [1,S,S])

    def crop_face(self, img_rgb: np.ndarray, save_path=None) -> np.ndarray:
        """(ref: hair_editor.py:312-329)"""
        out = self.editor.crop_face(np.asarray(img_rgb, np.uint8))
        if save_path is not None:
            from ctrlhair_tpu.utils.image import write_rgb
            write_rgb(save_path, out)
        return out

    # ------------------------------------------------------------- analysis
    def parse_img(self, img_rgb: np.ndarray, target_img: bool = False):
        res = self.editor.analyze_image(np.asarray(img_rgb, np.uint8))
        img_ts = self._resized256(img_rgb)
        out_mask = (None if target_img
                    else np.asarray(res['regen_label'][0]))
        mask = np.asarray(res['label'][0])
        # cache the 512px parse for shape transfers (device array, lazy);
        # landmarks are derived on first use (see _landmarks81)
        key = 'target' if target_img else 'input'
        self._parse512[key] = res['label512'][0]
        self._lm81[key] = None
        return (img_ts, out_mask, res['latent'], mask,
                res['sean_codes'], res['hair_feature'])

    def _landmarks81(self, key: str):
        """Cached [81,2] landmarks from the cached 512px parse — the
        target/input geometry does not change between transfers, so repeated
        transfers skip both the parse program and the host landmark
        estimation (the reference re-runs dlib+BiSeNet per transfer,
        ref: wrap_codes/mask_adaptor.py:202-212)."""
        if self._lm81.get(key) is None and self._parse512.get(key) is not None:
            from ctrlhair_tpu.ops.landmarks import estimate_landmarks_81
            # ONE host readback per image: the np copy feeds both the
            # landmark estimation and the host rasterizer across every
            # subsequent transfer
            self._parse512_np[key] = np.asarray(self._parse512[key])
            img = self.target_img if key == 'target' else self.input_img
            self._lm81[key] = estimate_landmarks_81(
                self._parse512_np[key],
                image=None if img is None else np.asarray(img))
        return self._lm81.get(key)

    def _resized256(self, img_rgb: np.ndarray) -> np.ndarray:
        s = self.cfg.edit_size
        if img_rgb.shape[0] == s and img_rgb.shape[1] == s:
            return np.asarray(img_rgb, np.uint8)
        from ctrlhair_tpu.ops.resize import resize_bilinear_nhwc
        out = resize_bilinear_nhwc(
            jnp.asarray(img_rgb, jnp.float32)[None], (s, s))
        return np.asarray(jnp.clip(jnp.round(out[0]), 0, 255), np.uint8)

    def set_input_img(self, img_rgb: np.ndarray):
        (self.input_img, self.cur_mask, self.cur_latent, self.input_mask,
         self.input_sean_code, self.input_hair_feature) = self.parse_img(
            img_rgb)
        return self.input_img, mask_to_rgb(self.cur_mask, draw_type=1)

    def set_target_img(self, img_rgb: np.ndarray):
        (self.target_img, _, self.target_latent, self.target_mask,
         _, self.target_hair_feature) = self.parse_img(img_rgb, True)
        return self.target_img, mask_to_rgb(self.target_mask, draw_type=1)

    # -------------------------------------------------------------- render
    def output(self, target_latent: Optional[Latent] = None,
               feature=None) -> np.ndarray:
        """Render the edited image (ref: ui/backend.py:147-175)."""
        if target_latent is not None and feature is None and self.blending:
            # fused tick: mask decode + render + blend in ONE program and
            # ONE host sync (the mask comes back as a second output)
            out, mask = self.editor.output_refresh(
                self.editor.params, self.input_sean_code, target_latent,
                jnp.asarray(self.input_img)[None],
                jnp.asarray(self.input_mask)[None])
            self.cur_mask = mask[0]   # device array: lazy
            return np.asarray(out[0])
        if target_latent is None:
            target_latent = self.cur_latent
            target_mask = self._cur_mask_batched()
        else:
            target_mask = self.editor.decode_mask(
                self.editor.params, target_latent.shape, target_latent.face)
            self.cur_mask = target_mask[0]   # device array: lazy
        img = self.editor.edit_render(
            self.editor.params, self.input_sean_code, target_mask,
            target_latent, feature)
        if self.blending:
            out = self.editor.blend(
                self.editor.params, jnp.asarray(self.input_img)[None], img,
                jnp.asarray(self.input_mask)[None], target_mask)
            return np.asarray(out[0])
        return np.asarray(
            jnp.clip(jnp.round(img[0] * 127.5 + 127.5), 0, 255)
        ).astype(np.uint8)

    # --------------------------------------------------------------- edits
    def change_curliness(self, val: float) -> None:
        self.cur_latent = self.cur_latent.replace(
            curliness=jnp.full_like(self.cur_latent.curliness, val))

    def change_color(self, val: float, idx: int) -> None:
        """idx 0..2 = HSV via empirical-CDF mapping; 3 = variance
        (ref: ui/backend.py:196-209)."""
        if idx == 3:
            v = (val + self.maximum_value_fe) / 2 / self.maximum_value_fe
            self.cur_latent = self.cur_latent.replace(
                pca_std=jnp.full_like(self.cur_latent.pca_std, v * 100 + 20))
        else:
            raw = self.dist_translation.gaussian_to_val(idx, val)
            self.cur_latent = self.cur_latent.replace(
                hsv=self.cur_latent.hsv.at[0, idx].set(raw))

    def change_shape(self, val: float, idx: int) -> None:
        # continue_change_with_direction already refreshes for 'shape'
        self.continue_change_with_direction('shape', self.shape_dirs[idx],
                                            val)

    def change_texture(self, val: float, idx: int) -> None:
        self.continue_change_with_direction('texture',
                                            self.texture_dirs[idx], val)

    def continue_change_with_direction(self, att_name: str, direction,
                                       val: float) -> None:
        vec = getattr(self.cur_latent, att_name)
        moved = latent_ops.apply_direction(vec, jnp.asarray(direction),
                                           jnp.asarray(val))
        self.cur_latent = self.cur_latent.replace(**{att_name: moved})
        if att_name == 'shape':
            self._refresh_mask_async()

    # ---------------------------------------------------------- frontend IO
    def get_curliness_be2fe(self):
        return float(self.cur_latent.curliness[0, 0])

    def get_color_be2fe(self):
        hsv = np.asarray(self.cur_latent.hsv[0])
        c = [float(self.dist_translation.val_to_gaussian(i, hsv[i]))
             for i in range(3)]
        var_fe = (float(self.cur_latent.pca_std[0, 0]) - 20) / 100 \
            * 2 * self.maximum_value_fe - self.maximum_value_fe
        return c[0], c[1], c[2], var_fe

    def get_shape_be2fe(self):
        return [float(latent_ops.projection(
            self.cur_latent.shape, jnp.asarray(self.shape_dirs[i]))[0])
            for i in range(4)]

    def get_texture_be2fe(self):
        return [float(latent_ops.projection(
            self.cur_latent.texture, jnp.asarray(self.texture_dirs[i]))[0])
            for i in range(2)]

    # ------------------------------------------------------------- transfer
    def transfer_latent_representation(self, flag: str,
                                       refresh: bool = True) -> None:
        """(ref: ui/backend.py:266-302)"""
        if flag == 'shape':
            from ctrlhair_tpu.ops.warp import warp_hair_mask_between_images
            # backend inputs are already aligned by set_input_img, so the
            # 1024 crop stage is skipped (ref: ui/backend.py:275 need_crop=False)
            lm_t = self._landmarks81('target')   # also fills _parse512_np
            lm_i = self._landmarks81('input')
            wt = warp_hair_mask_between_images(
                self.target_img, self.input_img,
                editor=self.editor, need_crop=False,
                hair_parse512=self._parse512_np.get(
                    'target', self._parse512.get('target')),
                face_parse512=self._parse512_np.get(
                    'input', self._parse512.get('input')),
                hair_lm81=lm_t, face_lm81=lm_i)
            self.warp_target = wt
            shape_code, face_code = self.editor.encode_shape(
                self.editor.params, jnp.asarray(wt, jnp.int32)[None])
            self.target_latent = self.target_latent.replace(
                shape=shape_code, face=face_code)
            # pre-transfer refresh replicated from the reference
            # (ui/backend.py:287): decodes the still-untransferred latent;
            # with refresh=True the post-transfer refresh supersedes it
            self._refresh_mask_async()

        self.cur_latent = latent_ops.transfer(self.cur_latent,
                                              self.target_latent, flag)
        if flag == 'shape' and refresh:
            self._refresh_mask_async()

    # cur_mask is device-backed and materialised lazily: per-tick internal
    # refreshes (change_shape -> output) never force a host sync for it —
    # the mask rides the device queue into the next edit program, and only
    # an actual host read (get_cur_mask, .cur_mask) synchronises.
    @property
    def cur_mask(self):
        if self._cur_mask_np is None and self._cur_mask_dev is not None:
            self._cur_mask_np = np.asarray(self._cur_mask_dev)
        return self._cur_mask_np

    @cur_mask.setter
    def cur_mask(self, value):
        if value is None or isinstance(value, np.ndarray):
            self._cur_mask_np, self._cur_mask_dev = value, None
        else:
            self._cur_mask_np, self._cur_mask_dev = None, value

    def _cur_mask_batched(self) -> jnp.ndarray:
        """[1,S,S] device label, without a host round trip if possible."""
        if self._cur_mask_dev is not None:
            return self._cur_mask_dev[None]
        return jnp.asarray(self._cur_mask_np)[None]

    def _refresh_mask_async(self,
                            target_latent: Optional[Latent] = None) -> None:
        """Decode the mask for the current latent WITHOUT reading it back;
        the device array chains into the next program on the queue."""
        if target_latent is None:
            target_latent = self.cur_latent
        out = self.editor.decode_mask(
            self.editor.params, target_latent.shape, target_latent.face)
        self.cur_mask = out[0]   # device array: lazy

    def refresh_cur_mask(self, target_latent: Optional[Latent] = None):
        self._refresh_mask_async(target_latent)
        return self.cur_mask, mask_to_rgb(self.cur_mask, draw_type=1)

    def get_cur_mask(self):
        return mask_to_rgb(self.cur_mask, draw_type=1)

    # ----------------------------------------------------- colour utilities
    @staticmethod
    def tensor_hsv_to_rgb(hsv) -> jnp.ndarray:
        """uint8-range HSV -> RGB on device (ref: ui/backend.py:108-115)."""
        from ctrlhair_tpu.utils.colorspace import hsv_to_rgb_u8
        return hsv_to_rgb_u8(jnp.asarray(hsv)).astype(jnp.float32)

    @staticmethod
    def tensor_rgb_to_hsv(rgb) -> jnp.ndarray:
        """uint8-range RGB -> HSV on device (ref: ui/backend.py:117-125)."""
        from ctrlhair_tpu.utils.colorspace import rgb_to_hsv_u8
        return rgb_to_hsv_u8(jnp.asarray(rgb)).astype(jnp.float32)

    @staticmethod
    def interpolate_hsv(hsv1, hsv2, alpha) -> jnp.ndarray:
        """HSV lerp through RGB space (ref: ui/backend.py:323-332)."""
        return latent_ops.interpolate_hsv(jnp.asarray(hsv1),
                                          jnp.asarray(hsv2), alpha)

    # -------------------------------------------------------- interpolation
    def interpolate(self, l1: Latent, l2: Latent, alpha) -> Latent:
        res = latent_ops.interpolate(l1, l2, alpha)
        return res.replace(face=self.cur_latent.face)

    def interpolate_each_att(self, l1: Latent, l2: Latent, alpha,
                             att_name: str) -> Latent:
        res = latent_ops.interpolate_attribute(self.cur_latent, l1, l2,
                                               alpha, att_name)
        return res.replace(face=self.cur_latent.face)

    def interpolate_triple(self, l1, l2, l3, a1, a2, a3) -> Latent:
        res = latent_ops.interpolate_triple(l1, l2, l3, a1, a2, a3)
        return res.replace(face=self.cur_latent.face)

    # ------------------------------------------------------------- sampling
    def get_random_texture(self) -> None:
        self.cur_latent = self.cur_latent.replace(
            texture=jnp.asarray(
                self._rng.standard_normal((1, TEXTURE_DIM)), jnp.float32))

    def get_random_shape(self) -> None:
        self.cur_latent = self.cur_latent.replace(
            shape=jnp.asarray(
                self._rng.standard_normal((1, SHAPE_DIM)), jnp.float32))
        self._refresh_mask_async()

    def get_random_curliness(self) -> None:
        self.cur_latent = self.cur_latent.replace(
            curliness=jnp.asarray(
                self._rng.standard_normal((1, 1)), jnp.float32))

    # ------------------------------------------------------------- batched
    def output_batch(self, latents: Latent) -> np.ndarray:
        """Render a BATCH of latents against the current input in one device
        program (the reference renders one edit at a time; this is the
        vmapped multi-edit path of BASELINE config 5).

        latents: Latent with leading batch dim N -> [N, S, S, 3] uint8.
        """
        n = latents.texture.shape[0]
        codes = jnp.tile(self.input_sean_code, (n, 1, 1))
        mask = jnp.tile(self._cur_mask_batched(), (n, 1, 1))
        if self.blending:
            # ONE fused render+blend program (same program the single-edit
            # path uses) instead of edit_render + blend: halves dispatches
            # and keeps the intermediate render on device
            face1, flabel1 = self._input_batched()
            face = jnp.tile(face1, (n, 1, 1, 1))
            flabel = jnp.tile(flabel1, (n, 1, 1))
            out = self.editor.output(self.editor.params, codes, latents,
                                     face, flabel, mask)
            return np.asarray(out)
        img = self.editor.edit_render(self.editor.params, codes, mask,
                                      latents)
        return np.asarray(jnp.clip(
            jnp.round(img * 127.5 + 127.5), 0, 255)).astype(np.uint8)

    def _input_batched(self):
        """Device-cached (face image, face label) batch-1 pair; invalidated
        by set_input_img storing new host arrays."""
        if self._input_dev is None or self._input_dev[2] is not self.input_img:
            self._input_dev = (jnp.asarray(self.input_img)[None],
                               jnp.asarray(self.input_mask)[None],
                               self.input_img)
        return self._input_dev[0], self._input_dev[1]

    def interpolation_sweep(self, l1: Latent, l2: Latent, alphas,
                            readback: bool = True):
        """Render latent interpolations for every alpha in one fused device
        program (interpolate + render + blend, editor._output_sweep) —
        vs the reference's per-alpha backend calls.  Host traffic per sweep:
        the [N] alpha vector up, plus (optionally) one uint8 batch down."""
        a = jnp.asarray(alphas, jnp.float32)
        l1 = l1.replace(face=self.cur_latent.face)
        if self.blending:
            face, flabel = self._input_batched()
            out = self.editor.output_sweep(
                self.editor.params, self.input_sean_code, l1, l2, a,
                face, flabel, self._cur_mask_batched())
            return np.asarray(out) if readback else out
        n = a.shape[0]
        lats = latent_ops.interpolate(l1, l2, a[:, None])
        lats = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n,) + x.shape[1:]), lats)
        return self.output_batch(lats)

    def random_texture_sweep(self, n: int) -> np.ndarray:
        """n random texture samples rendered in one batch."""
        base = self.cur_latent
        lats = Latent(
            hsv=jnp.tile(base.hsv, (n, 1)),
            pca_std=jnp.tile(base.pca_std, (n, 1)),
            curliness=jnp.asarray(
                self._rng.standard_normal((n, 1)), jnp.float32),
            texture=jnp.asarray(
                self._rng.standard_normal((n, TEXTURE_DIM)), jnp.float32),
            shape=jnp.tile(base.shape, (n, 1)),
            face=jnp.tile(base.face, (n, 1)))
        return self.output_batch(lats)

    # ------------------------------------------------------------ mask edit
    @staticmethod
    def show_hair_region(mask, non_hair_value: int = 0):
        rgb = mask_to_rgb(mask, draw_type=1)
        rgb[np.asarray(mask) != HAIR_IDX] = non_hair_value
        return rgb

    def directly_change_hair_mask(self, hair_mask: np.ndarray) -> None:
        """Replace the hair region with a painted mask
        (ref: ui/backend.py:409-420)."""
        sg = self.editor.shape_gen
        face_logit = sg.apply(self.editor.params['shape'],
                              method=lambda m, fc: m.face_decoder(fc),
                              fc=self.cur_latent.face)
        hm = jnp.asarray(hair_mask == HAIR_IDX, jnp.float32)[None, ..., None]
        lo, hi = jnp.min(face_logit), jnp.max(face_logit)
        hair_logit = hm * (hi - lo + 2.0) + lo - 1.0
        mask = sg.apply(self.editor.params['shape'], hair_logit, face_logit,
                        method=sg.merge_logits)
        from ctrlhair_tpu.utils.masks import one_hot_to_label
        self.cur_mask = np.asarray(one_hot_to_label(mask)[0])
