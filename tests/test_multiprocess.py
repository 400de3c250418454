"""REAL multi-process validation: 2 OS processes under jax.distributed
(Gloo CPU collectives), not the fake in-process transport of
tests/test_reduce.py.

Executes scripts/dryrun_multiprocess.py end-to-end: real
``process_allgather`` metric reduction, interleaved per-host loader
shard + ``put_batch`` global-batch assembly, orbax coordinated
all-process checkpoint save, and single-process restore of the
multi-host-written checkpoint.  The parent asserts the 2-process global
val loss equals a single-process full-data run (reference capability:
multi-rank DDP, /root/reference/GPT_VAE_train.py:166-182).
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_fit_matches_single_process():
    script = os.path.join(REPO, "scripts", "dryrun_multiprocess.py")
    # one retry: on the 1-core host the coordination-service shutdown
    # barrier can time out under full-suite load (one child reaches
    # shutdown while the other is still materialising a value) — a
    # scheduler-timing flake, not a correctness failure; observed once
    # in ~10 suite runs, always green standalone
    for attempt in range(2):
        out = subprocess.run([sys.executable, script], capture_output=True,
                             text=True, timeout=1500, cwd=REPO)
        if out.returncode == 0:
            break
    assert out.returncode == 0, out.stdout + out.stderr
    last = json.loads(out.stdout.strip().splitlines()[-1])
    assert last["ok"] is True
    assert last["val_multiprocess"] == pytest.approx(
        last["val_singleprocess"], abs=1e-4)
    assert last["val_restored"] == pytest.approx(
        last["val_multiprocess"], abs=1e-6)
    # corpus MI/AU: the collective posterior gather makes the 2-process
    # values equal the single-process full-corpus values
    assert last["mi_multiprocess"] == pytest.approx(
        last["mi_singleprocess"], abs=1e-6)
    assert last["au_multiprocess"] == last["au_singleprocess"]
