"""The published-numbers reproduction harness, proven hermetically.

Runs tools/reproduce_published.py's fixture mode — the full stage chain
(raw dump -> preprocess -> PMGT pretrain -> embedding export ->
NeuMF-PMGT -> DCN-PMGT -> compare) over the checked-in miniature
reference-format fixture (tests/fixtures/ref_mini, built by
tools/make_ref_fixture.py). Every artifact handoff is the real one; only
model size and epoch counts are scaled down. This is the proof that the
harness is one network grant away from the real VG/TG attempt
(BASELINE.md targets).
"""
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
FIXTURE = os.path.join(REPO, "tests", "fixtures", "ref_mini")


@pytest.fixture(scope="module")
def fixture_report(tmp_path_factory):
    import reproduce_published as rp

    work = str(tmp_path_factory.mktemp("repro"))
    return rp.run_fixture(work, fixture_dir=FIXTURE, epochs=2), work


def test_all_stages_ok(fixture_report):
    report, _ = fixture_report
    statuses = {e["stage"]: e["status"] for e in report["stages"]}
    assert statuses == {
        "download": "ok",
        "preprocess": "ok",
        "pretrain_h32": "ok",
        "export_h32": "ok",
        "neumf_pmgt": "ok",
        "dcn_pmgt": "ok",
        "compare": "ok",
    }, statuses


def test_export_artifact_is_reference_shaped(fixture_report):
    report, work = fixture_report
    export = next(e for e in report["stages"] if e["stage"] == "export_h32")
    emb = np.load(export["path"])
    assert emb.shape == (63, 32)  # one row per graph node, hidden dim
    assert np.isfinite(emb).all()


def test_downstream_metrics_finite(fixture_report):
    report, _ = fixture_report
    for stage in ("neumf_pmgt", "dcn_pmgt"):
        entry = next(e for e in report["stages"] if e["stage"] == stage)
        assert entry["metrics"], stage
        for k, v in entry["metrics"].items():
            assert np.isfinite(v), (stage, k, v)


def test_real_mode_records_blocked_download(tmp_path, monkeypatch):
    """Without network, real mode must produce a committed-attempt record:
    blocked download stage + the exact error + an actionable blocker."""
    import reproduce_published as rp

    def no_network(*a, **k):
        raise OSError("[Errno 101] Network is unreachable (test stub)")

    import pmgt_tpu.data.ingest as ingest

    # download_reviews binds urlopen as a default arg at import time, so
    # patch the function the harness calls, not urllib
    monkeypatch.setattr(ingest, "download_reviews", no_network)
    # the features probe retries real timm/HF downloads — stub it so the
    # test doesn't spend minutes in HTTP retry loops
    monkeypatch.setattr(
        rp,
        "stage_features_available",
        lambda report, *a: rp._record(
            report, "features", "blocked", stub=True
        ),
    )
    report = rp.run_real("VG", str(tmp_path))
    statuses = {e["stage"]: e["status"] for e in report["stages"]}
    assert statuses["download"] == "blocked"
    dl = next(e for e in report["stages"] if e["stage"] == "download")
    assert "Network is unreachable" in dl["error"]
    assert "deepyeti" in report["blocker"]
    # The blocker must document every pre-seeded drop-in path (the
    # data-only reproduction route).
    assert "reviews.json.gz" in report["blocker"]
    assert "feats.npz" in report["blocker"]


def test_compare_gate_logic():
    """compare passes iff the dataset's primary BASELINE.md metrics are
    within 1% or above."""
    import reproduce_published as rp

    def entry(metrics):
        return {"status": "ok", "metrics": metrics}

    # VG primary gate = NCF n20/r20
    rep = {"stages": []}
    out = rp.stage_compare(
        rep, "VG", entry({"test/n20": 0.2060, "test/r20": 0.3700}), None
    )
    assert out["status"] == "ok"  # -0.3% and above target

    rep = {"stages": []}
    out = rp.stage_compare(
        rep, "VG", entry({"test/n20": 0.19, "test/r20": 0.3661}), None
    )
    assert out["status"] == "failed"  # n20 8% below

    # TG primary gate = DCN auc; a missing NCF entry doesn't block it
    rep = {"stages": []}
    out = rp.stage_compare(rep, "TG", None, entry({"test/auc": 0.8490}))
    assert out["status"] == "ok"

    # nothing ran -> blocked
    rep = {"stages": []}
    assert rp.stage_compare(rep, "TG", None, None)["status"] == "blocked"
