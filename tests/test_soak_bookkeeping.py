# The soak's cross-resume bookkeeping (VERDICT r4 weak #7): a resumed run
# that trains 0 steps must not erase the throughput record of the run that
# did the training, and per-family totals must accumulate.
import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_soak_module():
    """Import scripts/train_soak.py as a module without running main()."""
    path = os.path.join(REPO, 'scripts', 'train_soak.py')
    spec = importlib.util.spec_from_file_location('train_soak_mod', path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules['train_soak_mod'] = mod
    spec.loader.exec_module(mod)
    return mod


def test_add_progress_accumulates_and_survives_zero_step_resume(tmp_path):
    soak = _load_soak_module()
    work = str(tmp_path)

    # run 1: 1000 steps in 50 s (20 steps/s)
    out1 = soak.add_progress(work, 'shape', 1000, 50.0, 1000)
    assert out1['steps_this_run'] == 1000
    assert out1['steps_per_sec_this_run'] == 20.0
    assert out1['steps_total_all_runs'] == 1000
    assert out1['best_steps_per_sec'] == 20.0

    # run 2 (resume): trains more, slower
    out2 = soak.add_progress(work, 'shape', 500, 100.0, 1500)
    assert out2['steps_total_all_runs'] == 1500
    assert out2['seconds_total_all_runs'] == 150.0
    assert out2['best_steps_per_sec'] == 20.0   # best is kept, not last

    # run 3 (resume that only re-curates: 0 steps) — the r4 failure mode
    # zeroed steps_per_sec; now history must survive
    out3 = soak.add_progress(work, 'shape', 0, 0.0, 1500)
    assert out3['steps_this_run'] == 0
    assert out3['steps_total_all_runs'] == 1500
    assert out3['seconds_total_all_runs'] == 150.0
    assert out3['best_steps_per_sec'] == 20.0

    # families are independent
    out_ct = soak.add_progress(work, 'ct', 10, 1.0, 10)
    assert out_ct['steps_total_all_runs'] == 10
    data = json.load(open(os.path.join(work, 'soak_state',
                                       'progress.json')))
    assert set(data) == {'shape', 'ct'}
    assert data['shape']['steps_total'] == 1500


def test_progress_file_written_atomically(tmp_path):
    soak = _load_soak_module()
    work = str(tmp_path)
    soak.add_progress(work, 'sean', 100, 10.0, 100)
    path = os.path.join(work, 'soak_state', 'progress.json')
    assert os.path.exists(path)
    assert not os.path.exists(path + '.tmp')   # os.replace'd into place
