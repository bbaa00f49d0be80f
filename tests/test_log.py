"""Leveled logging (log.dart:23-73): levels filter, SEVERE raises,
warning-classification adapter used by the parser/manager call sites."""
import pytest

from dartray_tpu import log as lg


def test_levels_filter_and_prefix():
    got = []
    log = lg.Log(callback=lambda lv, m: got.append((lv, m)),
                 level=lg.WARNING, prefix="[THREAD 1/4]")
    log.debug("nope")
    log.info("nope")
    log.warning("careful")
    log.error("bad")
    assert [lv for lv, _ in got] == [lg.WARNING, lg.ERROR]
    assert got[0][1].startswith("[THREAD 1/4] WARNING: careful")


def test_severe_raises():
    log = lg.Log(callback=lambda lv, m: None)
    with pytest.raises(lg.SevereLogError):
        log.severe("fatal condition")


def test_callback_adapter_classifies():
    got = []
    cb = lg.Log(callback=lambda lv, m: got.append(lv),
                level=lg.DEBUG).as_callback()
    cb("warning: accelerator 'kdtree' has no TPU-native implementation")
    cb("rendering 64x64")
    assert got == [lg.WARNING, lg.INFO]
