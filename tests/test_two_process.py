"""Real two-process CPU-mesh validation (cross-process collectives).

Unlike every other multi-device test (single process, 8 virtual devices,
``num_hosts`` override), this drives ``tools/two_process_check.py``: two
OS processes joined with ``jax.distributed.initialize``, the REAL
``process_index`` grouping in ``make_hybrid_mesh``, multi-process array
distribution via ``parallel.global_put``, a COLLECTIVE Orbax checkpoint
save/restore of the FSDP-sharded TrainState, and gRPC-backed collectives —
asserting rankings/scores/loss (and the post-restore step's loss) equal
the single-process run.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    import two_process_check as tpc

    # single-process reference runs IN-PROCESS on the conftest's 8-device
    # mesh (compile cache shared with the rest of the suite); only the two
    # real worker processes are spawned
    single = tpc.run_fixture(num_hosts_override=2,
                             ckpt_dir=str(tmp_path / "ckpt1p"))
    multi = tpc.spawn_two_process(timeout=900)
    rep = tpc.compare(single, multi)
    assert rep["rankings_equal"]
