"""wait_for_part_files liveness: indefinite wait overall, but a crashed
peer (no new part for stall_s) must raise instead of hanging forever
(r2 advisor finding on the infinite-default change)."""

import threading
import time

import pytest

from hypergen_tpu.io.sketch_db import wait_for_part_files


def test_returns_when_all_parts_exist(tmp_path):
    parts = [tmp_path / f"p{i}.done" for i in range(3)]
    for p in parts:
        p.write_text("ok")
    wait_for_part_files(parts)  # returns immediately


def test_stall_raises(tmp_path):
    parts = [tmp_path / f"p{i}.done" for i in range(2)]
    parts[0].write_text("ok")
    with pytest.raises(TimeoutError, match="no new pod part"):
        wait_for_part_files(parts, stall_s=0.6)


def test_progress_resets_stall_clock(tmp_path):
    parts = [tmp_path / f"p{i}.done" for i in range(3)]
    parts[0].write_text("ok")

    def publish_late():
        time.sleep(0.4)
        parts[1].write_text("ok")
        time.sleep(0.4)
        parts[2].write_text("ok")

    t = threading.Thread(target=publish_late)
    t.start()
    # each publish is within the 0.7 s stall window even though the total
    # wait exceeds it: progress resets the clock
    wait_for_part_files(parts, stall_s=0.7)
    t.join()


def test_total_timeout_still_applies(tmp_path):
    parts = [tmp_path / "never.done"]
    with pytest.raises(TimeoutError, match="missing parts"):
        wait_for_part_files(parts, timeout_s=0.4, stall_s=60.0)
