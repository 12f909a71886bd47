# Assemble a full editor parameter set from reference-trained checkpoints.
#
# Mirrors the reference's model-loading sweep (ref: hair_editor.py:45-119 +
# my_parsing_util.py:38-44): SEAN netG, BiSeNet, color_texture Model_G /
# Model_D, rgb + curliness predictors, shape Model_G — each converted via
# convert.torch_import and merged over randomly-initialised defaults, so a
# partial checkpoint directory still yields a runnable editor.

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


def _torch_load(path: str):
    import torch
    return torch.load(path, map_location='cpu', weights_only=False)


def _to_tree(converted):
    import jax.numpy as jnp
    import jax
    return jax.tree_util.tree_map(jnp.asarray, converted)


def load_reference_params(editor, *,
                          sean_path: Optional[str] = None,
                          bisenet_path: Optional[str] = None,
                          color_texture_ckpt: Optional[str] = None,
                          shape_ckpt: Optional[str] = None,
                          rgb_predictor_ckpt: Optional[str] = None,
                          curliness_predictor_ckpt: Optional[str] = None,
                          style_fallback_dir: Optional[str] = None
                          ) -> Dict[str, Any]:
    """Convert whatever reference checkpoints exist into editor.params.

    Branch checkpoints are the reference's {'Model_G','Model_D',...} dicts
    (ref: my_torchlib save_checkpoint payloads); DDP 'module.' prefixes are
    stripped.  Returns the updated params dict (also set on the editor).
    """
    from ctrlhair_tpu.convert import torch_import as ti

    params = dict(editor.params)
    cfg = editor.cfg

    if sean_path and os.path.exists(sean_path):
        sd = _torch_load(sean_path)
        if hasattr(sd, 'state_dict'):
            sd = sd.state_dict()
        params['sean'] = _to_tree(ti.convert_sean(
            ti.strip_ddp_prefix(sd), ngf=cfg.sean.ngf,
            semantic_nc=cfg.sean.semantic_nc,
            style_dim=cfg.sean.style_dim))

    if bisenet_path and os.path.exists(bisenet_path):
        sd = ti.strip_ddp_prefix(_torch_load(bisenet_path))
        params['bisenet'] = _to_tree(ti.convert_bisenet(sd))

    if color_texture_ckpt and os.path.exists(color_texture_ckpt):
        ckpt = _torch_load(color_texture_ckpt)
        gen_sd = ti.strip_ddp_prefix(ckpt['Model_G'])
        dis_sd = ti.strip_ddp_prefix(ckpt['Model_D'])
        params['ct_gen'] = _to_tree(ti.convert_ct_generator(
            gen_sd, cfg.color_texture.g_hidden_layer_num))
        params['ct_dis'] = _to_tree(ti.convert_ct_discriminator(
            dis_sd, cfg.color_texture.d_hidden_layer_num))

    if shape_ckpt and os.path.exists(shape_ckpt):
        ckpt = _torch_load(shape_ckpt)
        gen_sd = ti.strip_ddp_prefix(ckpt['Model_G'])
        params['shape'] = _to_tree(ti.convert_shape_generator(
            gen_sd, cfg.shape.layer_num, img_size=cfg.shape.img_size,
            hidden_in_channel=cfg.shape.hidden_in_channel,
            max_channel=cfg.shape.max_channel))

    if rgb_predictor_ckpt and os.path.exists(rgb_predictor_ckpt):
        ckpt = _torch_load(rgb_predictor_ckpt)
        sd = ti.strip_ddp_prefix(ckpt.get('Predictor', ckpt))
        params['rgb_pred'] = _to_tree(ti.convert_predictor(
            sd, cfg.rgb_predictor.hidden_layer_num,
            cfg.rgb_predictor.norm))

    if curliness_predictor_ckpt and os.path.exists(curliness_predictor_ckpt):
        ckpt = _torch_load(curliness_predictor_ckpt)
        sd = ti.strip_ddp_prefix(ckpt.get('Predictor', ckpt))
        params['curliness_pred'] = _to_tree(ti.convert_predictor(
            sd, cfg.curliness_predictor.hidden_layer_num,
            cfg.curliness_predictor.norm))

    editor.params = params
    if style_fallback_dir and os.path.isdir(style_fallback_dir):
        editor.load_style_fallback(style_fallback_dir)
    return editor.params


def load_native_params(editor, *,
                       color_texture_dir: Optional[str] = None,
                       shape_dir: Optional[str] = None,
                       rgb_predictor_dir: Optional[str] = None,
                       curliness_predictor_dir: Optional[str] = None,
                       bisenet_dir: Optional[str] = None,
                       sean_dir: Optional[str] = None,
                       seed: int = 0) -> Dict[str, Any]:
    """Load checkpoints trained by THIS framework (training/run_*.py,
    utils/checkpoint manifest format) into editor.params — the native
    analog of the reference's model_trained/ loading sweep
    (ref: hair_editor.py:45-119).  Each dir is a trainer checkpoint
    directory; missing/absent dirs leave that family's current params.
    Returns the updated params dict (also set on the editor).
    """
    import jax
    import jax.numpy as jnp
    from ctrlhair_tpu.utils.checkpoint import load_checkpoint

    params = dict(editor.params)
    rng = jax.random.PRNGKey(seed)

    def restore(ckpt_dir, *make_targets):
        """Restore the newest checkpoint against the first target structure
        that matches.  Two checkpoint contracts exist: the training loop
        saves the FULL train state (training/loop.py:93), while deployment
        checkpoints (scripts/train_soak.py) save the reduced inference
        pytree — both must load here.

        Restored leaves are cast bf16 -> f32: deployment checkpoints ship
        in bf16 for size, but the editor's interactive programs (and their
        warm executables) are signed on f32 param trees — serving bf16
        leaves would silently invalidate every warm artifact.
        """
        if not ckpt_dir or not os.path.isdir(ckpt_dir):
            return None
        for make in make_targets:
            try:
                res = load_checkpoint(ckpt_dir, make())
            except Exception:   # noqa: BLE001 — structure mismatch
                continue
            if res is not None:
                return jax.tree_util.tree_map(
                    lambda x: (x.astype(jnp.float32)
                               if getattr(x, 'dtype', None) == jnp.bfloat16
                               else x), res[0])
        return None

    def variables(model_params, stats):
        # trainers store model.params as the single-collection variables
        # dict {'params': ...}; graft the running stats back in
        out = dict(model_params)
        if stats:
            out['batch_stats'] = stats
        return out

    if color_texture_dir:
        from ctrlhair_tpu.training.color_texture_trainer import (
            ColorTextureTrainer)
        tr = ColorTextureTrainer(editor.cfg.color_texture)

        def ct_reduced():
            st = tr.init_state(rng)[0]
            return {'gen': st.gen.params, 'dis': st.dis.params}

        st = restore(color_texture_dir, ct_reduced,
                     lambda: tr.init_state(rng)[0])
        if st is not None:
            # gen/dis hold the FULL variables dict (init collections)
            if isinstance(st, dict):
                params['ct_gen'] = st['gen']
                params['ct_dis'] = st['dis']
            else:
                params['ct_gen'] = st.gen.params
                params['ct_dis'] = st.dis.params

    if shape_dir:
        from ctrlhair_tpu.training.shape_trainer import ShapeTrainer
        tr = ShapeTrainer(editor.cfg.shape)
        st = restore(
            shape_dir,
            lambda: {'gen': tr.init_state(rng).gen.params},
            lambda: tr.init_state(rng))
        if st is not None:
            params['shape'] = st['gen'] if isinstance(st, dict) \
                else st.gen.params

    def predictor_targets(tr, editor_key):
        def editor_shaped():
            # deployment checkpoints (train_soak) are saved in the
            # editor's own inference param structure
            return jax.tree_util.tree_map(lambda x: x,
                                          params[editor_key])

        def reduced_with_stats():
            st = tr.init_state(rng)
            return variables(st.model.params, st.stats)

        def reduced_no_stats():
            st = tr.init_state(rng)
            return dict(st.model.params)

        return (editor_shaped, reduced_with_stats, reduced_no_stats,
                lambda: tr.init_state(rng))

    def predictor_vars(st):
        if isinstance(st, dict):
            return st
        return variables(st.model.params, st.stats)

    if rgb_predictor_dir:
        from ctrlhair_tpu.training.predictor_trainer import PredictorTrainer
        tr = PredictorTrainer(editor.cfg.rgb_predictor)
        st = restore(rgb_predictor_dir,
                     *predictor_targets(tr, 'rgb_pred'))
        if st is not None:
            params['rgb_pred'] = predictor_vars(st)

    if curliness_predictor_dir:
        from ctrlhair_tpu.training.predictor_trainer import PredictorTrainer
        tr = PredictorTrainer(editor.cfg.curliness_predictor)
        st = restore(curliness_predictor_dir,
                     *predictor_targets(tr, 'curliness_pred'))
        if st is not None:
            params['curliness_pred'] = predictor_vars(st)

    if bisenet_dir:
        from ctrlhair_tpu.training.bisenet_trainer import BiSeNetTrainer
        tr = BiSeNetTrainer(editor.cfg.bisenet)
        st = restore(bisenet_dir, *predictor_targets(tr, 'bisenet'))
        if st is not None:
            params['bisenet'] = predictor_vars(st)

    if sean_dir:
        from ctrlhair_tpu.training.sean_trainer import SEANTrainer
        tr = SEANTrainer(editor.cfg.sean, use_vgg=False)

        def sean_reduced():
            # deployment contract (train_soak stage G): generator variables
            # only — spectral norm already folded, inference-ready
            return jax.tree_util.tree_map(lambda x: x, params['sean'])

        st = restore(sean_dir, sean_reduced, lambda: tr.init_state(rng))
        if st is not None:
            params['sean'] = (st if isinstance(st, dict) and 'params' in st
                              else variables(st.gen.params, st.gen_stats))

    editor.params = params
    return editor.params


def load_reference_tree(editor, root: str) -> Dict[str, Any]:
    """Load from the reference's on-disk layout rooted at `root`
    (ref paths: hair_editor.py:63,101, my_parsing_util.py:42,
    base_options.py:21-26)."""
    from ctrlhair_tpu.utils.checkpoint import latest_checkpoint_path

    def branch_ckpt(subdir):
        d = os.path.join(root, subdir, 'checkpoints')
        if not os.path.isdir(d):
            return None
        manifest = os.path.join(d, 'latest_checkpoint')
        if os.path.exists(manifest):
            with open(manifest) as f:
                return os.path.join(d, f.readline().strip())
        cands = sorted(f for f in os.listdir(d) if f.endswith('.ckpt'))
        return os.path.join(d, cands[-1]) if cands else None

    return load_reference_params(
        editor,
        sean_path=os.path.join(
            root, 'external_model_params', 'sean_checkpoints',
            'CelebA-HQ_pretrained', 'latest_net_G.pth'),
        bisenet_path=os.path.join(
            root, 'external_model_params', 'face_parsing_79999_iter.pth'),
        color_texture_ckpt=branch_ckpt(
            'model_trained/color_texture/045__color_texture_final'),
        shape_ckpt=branch_ckpt(
            'model_trained/shape/054__succeed__049__gan_fake_0.5_from_noise'),
        rgb_predictor_ckpt=branch_ckpt(
            'model_trained/color_encoder/p004___pca_std'),
        curliness_predictor_ckpt=branch_ckpt(
            'model_trained/curliness_classifier/p002___curliness'),
        style_fallback_dir=os.path.join(
            root, 'sean_codes', 'styles_test', 'mean_style_code', 'median'))


def load_trained_root(editor, root: str) -> Dict[str, Any]:
    """Load every native family checkpoint found under `root` into the
    editor.  Accepts both the reference's family directory names
    (color_encoder, curliness_classifier; ref hair_editor.py:101-119) and
    the soak workdir's (rgb_predictor, curliness_predictor, bisenet).
    """
    def sub(*names):
        for name in names:
            d = os.path.join(root, name, 'checkpoints')
            if os.path.isdir(d):
                return d
        return None

    return load_native_params(
        editor,
        color_texture_dir=sub('color_texture'),
        shape_dir=sub('shape'),
        bisenet_dir=sub('bisenet'),
        sean_dir=sub('sean'),
        rgb_predictor_dir=sub('color_encoder', 'rgb_predictor'),
        curliness_predictor_dir=sub('curliness_classifier',
                                    'curliness_predictor'))
