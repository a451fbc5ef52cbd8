"""World>1 (multi-PROCESS) tests: jax.distributed with 2 CPU processes of 2
devices each. The 8-device virtual mesh used everywhere else exercises device
sharding but not host semantics — payload padding in object gathers,
rank-dependent control flow, per-process global-batch assembly, and the SfM
pair-partition merge are only live at process_count > 1 (VERDICT r2 weak #2;
reference: src/utils/comm.py:142-220, train.py:136-148)."""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "mp_worker.py")


def _run_world(mode, port, extra=(), timeout=900, nproc=2):
    procs = []
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    for pid in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER, mode, str(pid), str(nproc), str(port),
             *extra],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=_REPO))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    results = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        lines = [ln for ln in out.splitlines()
                 if ln.startswith("RESULT_JSON:")]
        assert lines, f"worker {pid} emitted no result:\n{out[-4000:]}"
        results.append(json.loads(lines[-1][len("RESULT_JSON:"):]))
    return results


def test_world2_object_comm():
    """comm.all_gather/gather/reduce_dict at world=2 with UNEQUAL pickled
    payloads (the pad-to-max path is dead code at world=1)."""
    r = _run_world("comm", 46101)
    for pid, res in enumerate(r):
        assert res["world"] == 2 and res["rank"] == pid
        assert res["obj_ranks"] == [0, 1]
        assert res["obj_lens"] == [7, 7 + 137]
        assert res["reduce_mean_a"] == pytest.approx(0.5)
        assert res["reduce_mean_b"] == pytest.approx(2.0)
        assert res["reduce_sum_a"] == pytest.approx(1.0)
        assert res["arrs"] == [[0, 0], [1, 3]]
    # gather(dst=0): only rank 0 receives
    assert r[0]["gather0_len"] == 2 and r[1]["gather0_len"] == 0


def test_world2_sfm_pair_partition_merge():
    """SfM match_pairs: per-rank pair slice + all_gather merge covers every
    pair exactly once and agrees across ranks, including the padded
    duplicate from the non-divisible split (pipeline.py:101-135)."""
    r = _run_world("sfm", 46111)
    expect = sorted([[a, a + 1] for a in range(6)] + [[0, 3]])
    for res in r:
        assert res["n_pairs"] == 7
        assert sorted(res["keys"]) == expect
    assert r[0]["counts"] == r[1]["counts"]


def test_world2_train_cli(tmp_path):
    """cli/train.py end-to-end under 2 processes via --dist-coordinator:
    per-host scene sharding, global-batch assembly from process-local
    shards, GSPMD grad psum across hosts, val AUC aggregation, rank-0-only
    checkpoint/TB/config writes."""
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    h5py = pytest.importorskip("h5py")  # noqa: F841
    from tests.test_data_layer import make_fake_scene

    d = tmp_path / "scenes"
    d.mkdir()
    make_fake_scene(d, scene_id="0000", n_images=4, n_pairs=4)
    make_fake_scene(d, scene_id="0001", n_images=4, n_pairs=4)
    (d / "train_list.txt").write_text("0000\n0001\n")
    (d / "val_list.txt").write_text("0001\n")
    run = str(tmp_path / "run_mp")

    r = _run_world("cli", 46121, extra=(str(d), run), timeout=1500)
    assert all(res["done"] for res in r)
    assert all(res["world"] == 2 and res["devices"] == 4 for res in r)
    assert os.path.exists(os.path.join(run, "config.json"))
    ckpts = os.path.join(run, "ckpts")
    assert os.path.isdir(ckpts) and os.listdir(ckpts)
