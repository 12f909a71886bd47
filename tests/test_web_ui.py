# Web frontend (ui/web.py): the interactive L7 surface, exercised headlessly
# over real HTTP — page, state, slider events, transfers, and image panes
# (the reference's PyQt layer, ref: ui/frontend_demo.py:52-259, cannot run
# without a display; the web UI is this environment's interactive surface).
import json
import threading
import urllib.request

import numpy as np
import pytest

from ctrlhair_tpu.pipeline.backend import Backend
from ctrlhair_tpu.ui.web import WebEditor


@pytest.fixture(scope='module')
def server(tiny_editor):
    backend = Backend(maximum_value_fe=2.5, blending=False,
                      cfg=tiny_editor.cfg, editor=tiny_editor)
    editor = WebEditor(backend, maximum_value_fe=2.5)
    rng = np.random.default_rng(0)
    editor.load_input(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    editor.load_target(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    srv = editor.make_server(port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f'http://127.0.0.1:{srv.server_address[1]}', editor
    srv.shutdown()


def _get(url: str) -> bytes:
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.read()


def _post(url: str, payload: dict) -> dict:
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 method='POST')
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def test_page_and_state(server):
    base, _ = server
    page = _get(base + '/').decode()
    # all eleven sliders + three transfers present in the page spec
    assert page.count('Transfer') == 3
    specs = json.loads(page.split('const SPECS = ')[1].split(';')[0])
    assert len(specs) == 11
    st = json.loads(_get(base + '/state'))
    assert st['has_input'] and st['has_target']
    assert len(st['sliders']) == 11


def test_slider_event_renders_output(server):
    base, editor = server
    r = _post(base + '/slider', {'group': 'color', 'idx': 0, 'value': 1.2})
    assert r['ok']
    png = _get(base + '/image/output')
    assert png[:8] == b'\x89PNG\r\n\x1a\n'
    st = json.loads(_get(base + '/state'))
    assert abs(st['sliders']['color:0'] - 1.2) < 0.15  # hsv quantisation
    _post(base + '/slider', {'group': 'shape', 'idx': 0, 'value': 2.0})
    st2 = json.loads(_get(base + '/state'))
    # the latent moved along the shape direction and the pane re-rendered
    assert abs(st2['sliders']['shape:0'] - 2.0) < 1e-4
    assert editor.images['output'] is not None
    assert editor.images['output'].shape[-1] == 3


def test_transfer_and_random(server):
    base, _ = server
    assert _post(base + '/transfer', {'arg': 'color'})['ok']
    assert _post(base + '/random', {'arg': 'texture'})['ok']
    png = _get(base + '/image/mask')
    assert png[:8] == b'\x89PNG\r\n\x1a\n'


def test_bad_requests(server):
    base, _ = server
    import urllib.error
    with pytest.raises(urllib.error.HTTPError):
        _get(base + '/image/nope')
    req = urllib.request.Request(base + '/slider', data=b'not json',
                                 method='POST')
    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(req, timeout=60)
