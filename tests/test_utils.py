"""Timer, ScanStats, logging setup."""

import logging
import time

from legkilo_tpu.utils.logging import setup as setup_logging
from legkilo_tpu.utils.profiling import ScanStats
from legkilo_tpu.utils.timing import Timer


def test_timer_running_average():
    Timer.reset()
    for _ in range(3):
        with Timer.measure("stage_a"):
            time.sleep(0.01)
    assert Timer.count("stage_a") == 3
    assert 5 <= Timer.average_ms("stage_a") <= 100
    Timer.log_all_average_time()  # smoke
    Timer.reset()
    assert Timer.count("stage_a") == 0


def test_scan_stats_report():
    s = ScanStats()
    s.update(n_raw=10000, n_points=2000, n_matched=1500)
    s.update(n_raw=10000, n_points=2000, n_matched=1700, dropped_events=1)
    r = s.report()
    assert r["scans"] == 2
    assert abs(r["match_ratio"] - 0.8) < 1e-6
    assert r["dropped_events"] == 1
    assert "match_ratio" in str(s)


def test_logging_setup_writes_file(tmp_path):
    log = setup_logging(log_dir=str(tmp_path), name="testlog")
    log.info("hello %d", 42)
    for h in logging.getLogger().handlers:
        h.flush()
    files = list(tmp_path.glob("testlog_*.log"))
    assert len(files) == 1
    assert "hello 42" in files[0].read_text()
    # Reset handlers so later tests aren't affected.
    logging.getLogger().handlers.clear()
    logging.basicConfig()
