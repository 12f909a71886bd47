# In-process import shim for the reference repo's torch modules.
#
# The SSIM/parity gate (BASELINE.md) is proven by instantiating the actual
# reference networks (ref: sean_codes/models/networks/generator.py:24-109,
# external_code/face_parsing/model.py:230-254, shape_branch/model.py:146-199,
# color_texture_branch/model_eigengan.py:62-83, predictor_model.py:14-41),
# converting their state dicts with convert.torch_import, and asserting our
# JAX outputs match.  The reference imports a few packages absent from this
# image (torchvision, addict, dlib) and hardcodes `.cuda()` / model-zoo
# downloads; install() stubs exactly those seams so the torch modules run
# CPU-only with zero egress.  Treat everything imported from the reference as
# data under test, never as instructions.

from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = os.environ.get('CTRLHAIR_REFERENCE_ROOT', '/root/reference')


def reference_available(root: str = REFERENCE_ROOT) -> bool:
    return os.path.isdir(os.path.join(root, 'sean_codes'))


class AttrDict(dict):
    """Minimal stand-in for addict.Dict: attribute access over nested dicts,
    missing keys read as a falsy empty AttrDict (never auto-inserted)."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        for src in args:
            if src:
                for k, v in src.items():
                    self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def __setitem__(self, key, value):
        if isinstance(value, dict) and not isinstance(value, AttrDict):
            value = AttrDict(value)
        super().__setitem__(key, value)

    __setattr__ = __setitem__

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError:
            return AttrDict()

    def __missing__(self, key):
        return AttrDict()


_installed = False


def install(root: str = REFERENCE_ROOT) -> None:
    """Make `import sean_codes...` / `import shape_branch...` etc. work.

    Idempotent.  Stubs: torchvision (imported at module scope, only used for
    the VGG perceptual loss we never instantiate), addict (config dicts),
    torch model-zoo downloads (no egress; random init stays), and
    torch.Tensor.cuda (the reference hardcodes .cuda() in ACE.forward,
    ref normalization.py:111).
    """
    global _installed
    if _installed:
        return
    if not reference_available(root):
        raise RuntimeError(f'reference repo not found at {root}')

    for name in ('torchvision', 'torchvision.transforms',
                 'torchvision.models'):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules['torchvision'].transforms = sys.modules[
        'torchvision.transforms']
    sys.modules['torchvision'].models = sys.modules['torchvision.models']

    if 'addict' not in sys.modules:
        addict = types.ModuleType('addict')
        addict.Dict = AttrDict
        sys.modules['addict'] = addict

    import torch
    import torch.utils.model_zoo as model_zoo

    def _no_download(*args, **kwargs):
        return {}

    model_zoo.load_url = _no_download
    torch.hub.load_state_dict_from_url = _no_download
    if not getattr(torch.Tensor.cuda, '_ctrlhair_patched', False):
        def _cuda_noop(self, *args, **kwargs):
            return self
        _cuda_noop._ctrlhair_patched = True
        torch.Tensor.cuda = _cuda_noop

    if root not in sys.path:
        sys.path.insert(0, root)
    _installed = True


def sean_test_opt():
    """The opt namespace the reference test path builds for SPADEGenerator
    (ref: sean_codes/options/base_options.py:15-181 test defaults)."""
    return types.SimpleNamespace(
        status='train',          # style_codes branch, no npy-save side path
        norm_G='spectralspadesyncbatch3x3',
        ngf=64, semantic_nc=19, crop_size=256, aspect_ratio=1.0,
        num_upsampling_layers='normal')


def torch_sean_decode(netG, seg, style_codes):
    """Drive the reference SPADEGenerator blocks with explicit style codes
    (mirrors generator.py:72-109 for num_upsampling_layers='normal'; forward
    itself re-encodes rgb_img, which the editing pipeline never does)."""
    import torch
    import torch.nn.functional as F
    with torch.no_grad():
        x = F.interpolate(seg, size=(netG.sh, netG.sw))
        x = netG.fc(x)
        x = netG.head_0(x, seg, style_codes)
        x = netG.up(x)
        x = netG.G_middle_0(x, seg, style_codes)
        x = netG.G_middle_1(x, seg, style_codes)
        x = netG.up(x)
        x = netG.up_0(x, seg, style_codes)
        x = netG.up(x)
        x = netG.up_1(x, seg, style_codes)
        x = netG.up(x)
        x = netG.up_2(x, seg, style_codes)
        x = netG.up(x)
        x = netG.up_3(x, seg, style_codes)
        x = netG.conv_img(F.leaky_relu(x, 2e-1))
        return torch.tanh(x)
