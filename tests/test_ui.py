# UI logic tests (headless: slider math + Backend dispatch, no display).
import numpy as np
import pytest

from ctrlhair_tpu.ui.app import (
    SLIDER_SPECS, apply_slider, read_sliders, slider_to_value,
    value_to_slider)


def test_slider_specs_cover_reference_layout():
    groups = [g for g, _, _ in SLIDER_SPECS]
    assert groups.count('color') == 4
    assert groups.count('shape') == 4
    assert groups.count('texture') == 2
    assert groups.count('curliness') == 1
    assert len(SLIDER_SPECS) == 11


def test_slider_value_roundtrip():
    for v in (-2.0, -0.37, 0.0, 1.23, 2.0):
        assert abs(slider_to_value(value_to_slider(v), 2.0) - v) < 0.005


def test_apply_and_read_sliders(loaded_backend):
    be = loaded_backend
    apply_slider(be, 'color', 3, 1.0)
    apply_slider(be, 'curliness', 0, 0.5)
    apply_slider(be, 'texture', 0, -0.75)
    apply_slider(be, 'shape', 1, 1.5)
    vals = read_sliders(be)
    assert abs(vals[('color', 3)] - 1.0) < 1e-3
    assert abs(vals[('curliness', 0)] - 0.5) < 1e-5
    assert abs(vals[('texture', 0)] - (-0.75)) < 1e-3
    assert abs(vals[('shape', 1)] - 1.5) < 1e-3


@pytest.fixture(scope='module')
def loaded_backend(tiny_editor):
    from ctrlhair_tpu.pipeline.backend import Backend
    be = Backend(maximum_value_fe=2.5, blending=False,
                 cfg=tiny_editor.cfg, editor=tiny_editor)
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3),
                                            dtype=np.uint8)
    be.set_input_img(img)
    return be


def test_headless_demo(tmp_path, loaded_backend, monkeypatch):
    # run the headless path with a tiny backend by monkeypatching Backend
    import ctrlhair_tpu.ui.demo as demo

    monkeypatch.setattr('ctrlhair_tpu.pipeline.backend.Backend',
                        lambda **kw: loaded_backend)
    out_path = str(tmp_path / 'out.png')
    from ctrlhair_tpu.utils.image import write_rgb
    img = np.random.default_rng(1).integers(0, 255, (64, 64, 3),
                                            dtype=np.uint8)
    in_path = str(tmp_path / 'in.png')
    write_rgb(in_path, img)
    out = demo.main(['--headless', out_path, '--input', in_path,
                     '--no-blending'])
    assert out.shape[2] == 3
    import os
    assert os.path.exists(out_path)
