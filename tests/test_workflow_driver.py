"""Workflow-execution driver (examples/run_workflows_synthvoc.py) — the
pass/fail rules that keep the committed record honest.

A workflow that exits 0 after printing a non-finite loss (TerminateOnNaN
stops the loop but the script can still exit cleanly) must be recorded as
FAILED, and a workflow that hangs past its timeout must be recorded as
FAILED without aborting the driver.
"""

import importlib.util
import os
import sys

import pytest


@pytest.fixture()
def driver():
    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "run_workflows_synthvoc.py"
    )
    spec = importlib.util.spec_from_file_location("run_workflows_synthvoc", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_snippet(driver, name, code, timeout=60):
    results = []
    ok = driver.run(name, ["-c", code], results, timeout=timeout)
    assert len(results) == 1 and results[0]["workflow"] == name
    assert results[0]["ok"] is ok
    return ok, results[0]


def test_clean_exit_passes(driver):
    ok, _ = _run_snippet(driver, "good", "print('epoch 1/1 loss=12.3')")
    assert ok


def test_nonzero_exit_fails(driver):
    ok, _ = _run_snippet(driver, "diverged-exit",
                         "raise SystemExit('training diverged')")
    assert not ok


@pytest.mark.parametrize("line", ["loss=nan val_loss=nan", "loss=inf"])
def test_nonfinite_loss_fails_despite_exit_zero(driver, line):
    ok, rec = _run_snippet(driver, "diverged-quiet", f"print('epoch 1/1 {line}')")
    assert not ok


def test_timeout_recorded_not_raised(driver):
    ok, rec = _run_snippet(driver, "hung", "import time; time.sleep(30)",
                           timeout=2)
    assert not ok
    assert "timed out" in rec["tail"]


def test_checkpoint_epoch_sorts_numerically(driver):
    names = ["ckpt_9", "ckpt_10", "ckpt_2", "junk"]
    assert sorted(names, key=driver.checkpoint_epoch) == [
        "junk", "ckpt_2", "ckpt_9", "ckpt_10"]


def test_check_eval_map_floor(driver):
    check = driver.check_eval_map(0.2)
    assert check("foo\nmAP              0.3130\n") is None
    assert "below floor" in check("mAP              0.0512\n")
    assert "no mAP" in check("nothing here")


def test_check_coco_ap_floor(driver):
    check = driver.check_coco_ap(0.08)
    assert check("COCO AP=0.2110 AP50=0.4000") is None
    assert "below floor" in check("COCO AP=0.0100")
    assert "no COCO AP" in check("eval skipped")


def test_check_inference_boxes(driver):
    check = driver.check_inference_boxes()
    good = ("im.png:\n   class      conf    xmin    ymin    xmax    ymax\n"
            "   dog        0.912    12.0     6.5   295.0   240.2\n")
    assert check(good) is None
    assert "no detections" in check("im.png:\n   class conf header only\n")
    bad = good.replace("295.0", "-206926032.0")
    assert check(bad) is not None  # the exact failure r2's record rated 'ok'
    degen = good.replace("12.0", "296.0")
    assert "degenerate" in check(degen)
    outside = good.replace("295.0", "912.0")
    assert "outside frame" in check(outside)


def test_check_training_loss_decreased(driver, tmp_path):
    import csv as _csv

    path = tmp_path / "log.csv"
    with open(path, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["epoch", "loss"])
        w.writeheader()
        w.writerow({"epoch": 0, "loss": 18.0})
        w.writerow({"epoch": 1, "loss": 9.0})
    assert driver.check_training_loss_decreased(str(path))("") is None
    with open(path, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["epoch", "loss"])
        w.writeheader()
        w.writerow({"epoch": 0, "loss": 18.0})
        w.writerow({"epoch": 1, "loss": 17.5})
    assert "did not decrease" in driver.check_training_loss_decreased(str(path))("")
    assert "no CSV log" in driver.check_training_loss_decreased("/nope.csv")("")
    # A log polluted by a second run's repeated header (pre-fix CSVLogger
    # appended to stale files) must report, not raise.
    with open(path, "w") as f:
        f.write("epoch,loss\n0,18.0\n1,9.0\nepoch,loss\n")
    assert "unparseable" in driver.check_training_loss_decreased(str(path))("")
