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
