"""Round-trip tests for the model-preservation scripts.

``scripts/preserve_models.py`` snapshots trained weights / resume
checkpoints from an ``outputs/`` run dir into the committed
``checkpoints/`` tree; ``scripts/restore_run.py`` is its inverse. These
two scripts are the crash-recovery path for trained artifacts (the
reference has no equivalent — its checkpoints live and die with the run
dir, ``/root/reference/utils/misc.py:61-91``), and a host reset has
destroyed un-preserved models twice in this project's history, so the
contract is worth pinning:

- a completed run (``model/<name>`` present) preserves the final weights;
- an interrupted run (resume ``ckpt*`` only) preserves the checkpoint and
  the manifest row says so;
- re-preserving the same name replaces its manifest row (no duplicates);
- restore recreates the run dir, and never clobbers a resume checkpoint
  already present in the destination (assumed fresher).

Both scripts honor ``ALINE_REPO_ROOT`` so the tests run in a throwaway
tree instead of the real ``checkpoints/``.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRESERVE = os.path.join(REPO, "scripts", "preserve_models.py")
RESTORE = os.path.join(REPO, "scripts", "restore_run.py")


def run_script(script, args, root):
    env = dict(os.environ, ALINE_REPO_ROOT=str(root))
    return subprocess.run(
        [sys.executable, script, *args], env=env, capture_output=True,
        text=True, check=False)


def make_run_dir(root, name, with_model=True, with_ckpt=True):
    run = root / "outputs" / name
    (run / "logs").mkdir(parents=True)
    (run / "config.json").write_text('{"task": {"name": "toy"}}')
    (run / "metrics.jsonl").write_text('{"step": 5}\n')
    if with_model:
        model = run / "model" / "aline_toy" / "tree"
        model.mkdir(parents=True)
        (model / "params.bin").write_bytes(b"weights")
    if with_ckpt:
        ck = run / "ckpt_toy" / "tree"
        ck.mkdir(parents=True)
        (ck / "state.bin").write_bytes(b"resume")
        (run / "ckpt_toy" / "host_state.pkl").write_bytes(b"rng")
    return run


class TestPreserve:
    def test_completed_run_preserves_model(self, tmp_path):
        make_run_dir(tmp_path, "toy_run")
        r = run_script(PRESERVE, ["outputs/toy_run", "aline_toy",
                                  "toy_snap", "a note"], tmp_path)
        assert r.returncode == 0, r.stderr
        snap = tmp_path / "checkpoints" / "toy_snap"
        assert (snap / "model" / "aline_toy" / "tree" /
                "params.bin").read_bytes() == b"weights"
        assert (snap / "config.json").exists()
        assert (snap / "metrics.jsonl").exists()
        manifest = (tmp_path / "checkpoints" / "MANIFEST.md").read_text()
        assert "| toy_snap |" in manifest and "a note" in manifest

    def test_interrupted_run_preserves_resume_ckpt(self, tmp_path):
        make_run_dir(tmp_path, "toy_run", with_model=False)
        r = run_script(PRESERVE, ["outputs/toy_run", "aline_toy",
                                  "toy_snap", "mid-train"], tmp_path)
        assert r.returncode == 0, r.stderr
        snap = tmp_path / "checkpoints" / "toy_snap"
        assert (snap / "ckpt_toy" / "tree" /
                "state.bin").read_bytes() == b"resume"
        manifest = (tmp_path / "checkpoints" / "MANIFEST.md").read_text()
        assert "NO final model" in manifest
        assert "resume ckpt" in manifest

    def test_nothing_to_preserve_fails(self, tmp_path):
        make_run_dir(tmp_path, "toy_run", with_model=False,
                     with_ckpt=False)
        r = run_script(PRESERVE, ["outputs/toy_run", "aline_toy",
                                  "toy_snap"], tmp_path)
        assert r.returncode != 0

    def test_represerve_prunes_stale_snapshot_ckpt(self, tmp_path):
        # Mid-train preserve banks the resume ckpt; once the run
        # completes and the final model is fresher, re-preserving must
        # REMOVE the now-stale ckpt from the snapshot — otherwise a
        # later restore+resume would re-train epochs the snapshot's
        # final model already contains (round-4 advisor finding).
        run = make_run_dir(tmp_path, "toy_run", with_model=False)
        r = run_script(PRESERVE, ["outputs/toy_run", "aline_toy",
                                  "toy_snap", "mid-train"], tmp_path)
        assert r.returncode == 0, r.stderr
        snap = tmp_path / "checkpoints" / "toy_snap"
        assert (snap / "ckpt_toy").exists()
        model = run / "model" / "aline_toy" / "tree"
        model.mkdir(parents=True)
        (model / "params.bin").write_bytes(b"final-weights")
        old = os.path.getmtime(model) - 100
        os.utime(run / "ckpt_toy" / "tree", (old, old))
        r = run_script(PRESERVE, ["outputs/toy_run", "aline_toy",
                                  "toy_snap", "final"], tmp_path)
        assert r.returncode == 0, r.stderr
        assert (snap / "model" / "aline_toy" / "tree" /
                "params.bin").read_bytes() == b"final-weights"
        assert not (snap / "ckpt_toy").exists()

    def test_represerve_replaces_manifest_row(self, tmp_path):
        make_run_dir(tmp_path, "toy_run")
        for note in ("first", "second"):
            r = run_script(PRESERVE, ["outputs/toy_run", "aline_toy",
                                      "toy_snap", note], tmp_path)
            assert r.returncode == 0, r.stderr
        manifest = (tmp_path / "checkpoints" / "MANIFEST.md").read_text()
        rows = [ln for ln in manifest.splitlines()
                if ln.startswith("| toy_snap ")]
        assert len(rows) == 1 and "second" in rows[0]


class TestRestore:
    @pytest.fixture
    def preserved(self, tmp_path):
        make_run_dir(tmp_path, "toy_run")
        r = run_script(PRESERVE, ["outputs/toy_run", "aline_toy",
                                  "toy_snap", "n"], tmp_path)
        assert r.returncode == 0, r.stderr
        return tmp_path

    def test_restore_into_fresh_run_dir(self, preserved):
        r = run_script(RESTORE, ["toy_snap", "outputs/restored"],
                       preserved)
        assert r.returncode == 0, r.stderr
        run = preserved / "outputs" / "restored"
        assert (run / "config.json").exists()
        assert (run / "model" / "aline_toy" / "tree" /
                "params.bin").read_bytes() == b"weights"
        assert (run / "ckpt_toy" / "tree" /
                "state.bin").read_bytes() == b"resume"

    def test_restore_copies_metrics_trajectory(self, preserved):
        # The snapshot's metrics.jsonl (full training trajectory) must
        # come back with the run dir: the resumed train APPENDS to it,
        # and the next preserve then keeps the whole history instead of
        # only the post-restore tail (round-4 advisor finding, medium).
        r = run_script(RESTORE, ["toy_snap", "outputs/restored"],
                       preserved)
        assert r.returncode == 0, r.stderr
        run = preserved / "outputs" / "restored"
        assert (run / "metrics.jsonl").read_text() == '{"step": 5}\n'

    def test_restore_keeps_existing_ckpt(self, preserved):
        run = preserved / "outputs" / "restored"
        fresher = run / "ckpt_toy" / "tree"
        fresher.mkdir(parents=True)
        (fresher / "state.bin").write_bytes(b"newer-resume")
        r = run_script(RESTORE, ["toy_snap", "outputs/restored"],
                       preserved)
        assert r.returncode == 0, r.stderr
        assert (fresher / "state.bin").read_bytes() == b"newer-resume"

    def test_restore_missing_snapshot_fails(self, preserved):
        r = run_script(RESTORE, ["no_such_snap", "outputs/x"], preserved)
        assert r.returncode != 0
