"""tools/gate_rotation.py policy semantics (r9 verdict task 5).

The r9 check was expected-red from round close until the next rotation
landed — a ritual check red half the time trains people to ignore it.
r10 semantics: a window whose driver rows are already banked (GATE_ORDER
== the latest CORRECTNESS keys) is evaluated FOR ITS OWN round and the
next round's rotation debt is a warning; a window that is wrong for the
round it will actually gate still fails (negative test below). Anchors
(registry.GATE_ANCHORS) are exempt from the wasted-slot rules — they are
deliberately re-gated every round.
"""

from __future__ import annotations

import importlib.util
import pathlib
from types import SimpleNamespace

REPO = pathlib.Path(__file__).resolve().parent.parent

spec = importlib.util.spec_from_file_location(
    "gate_rotation", REPO / "tools" / "gate_rotation.py"
)
gr = importlib.util.module_from_spec(spec)
spec.loader.exec_module(gr)


def _fake_env(monkeypatch, banked: dict[int, list[str]], gate, anchors, nq=8):
    names = [f"q{i:02d}" for i in range(nq)]
    reg = SimpleNamespace(
        GATE_ORDER=gate,
        GATE_ANCHORS=anchors,
        queries=lambda: {n: None for n in names},
        oracle_sql=lambda: {n: "SELECT 1" for n in names},
    )
    latest = max(banked) if banked else 0

    def hist(cap=None):
        last: dict[str, int] = {}
        for rnd, keys in banked.items():
            if cap is not None and rnd >= cap:
                continue
            for q in keys:
                last[q] = max(last.get(q, 0), rnd)
        return last, latest

    monkeypatch.setattr(gr, "_load_registry", lambda: reg)
    monkeypatch.setattr(gr, "_history", hist)
    monkeypatch.setattr(gr, "_banked_keys", lambda r: set(banked.get(r, [])) or None)
    monkeypatch.setattr(gr, "WINDOW", 4)
    return reg


def test_banked_window_is_green_at_round_close(monkeypatch, capsys):
    # r2's window == its banked keys (a clean rotation from r1's set);
    # re-running the check after round close must stay green — the r3
    # rotation debt (re-gating r2-fresh queries) is only a warning.
    gate = ["q00", "q01", "q02", "q03"]
    _fake_env(
        monkeypatch, {1: ["q04", "q05", "q06", "q07"], 2: gate}, gate,
        anchors=["q00"], nq=12,  # q08..q11 never gated -> r3 debt exists
    )
    assert gr.cmd_check(0) == 0
    out = capsys.readouterr().out
    assert "policy OK (r2)" in out
    assert "WARNING" in out and "banked for r2" in out


def test_stale_window_for_its_own_round_fails(monkeypatch, capsys):
    # In-flight r3 window (not banked) re-gates r2-green non-anchor
    # queries while q04..q07 have never been gated: genuine violation.
    old = ["q00", "q01", "q02", "q03"]
    _fake_env(monkeypatch, {1: old, 2: old}, old[:4], anchors=[])
    # make it in-flight: banked keys for r2 differ from the gate head
    monkeypatch.setattr(gr, "_banked_keys", lambda r: {"q00", "q01"})
    assert gr.cmd_check(0) == 1
    assert "wasted slot" in capsys.readouterr().out


def test_anchor_regating_is_not_wasted(monkeypatch, capsys):
    # In-flight window = anchor (green last round) + 3 never-gated:
    # the anchor slot must not count as wasted.
    old = ["q00", "q01", "q02", "q03"]
    gate = ["q00", "q04", "q05", "q06"]
    _fake_env(monkeypatch, {1: old, 2: old}, gate, anchors=["q00"])
    monkeypatch.setattr(gr, "_banked_keys", lambda r: set(old))
    assert gr.cmd_check(0) == 0
    assert "policy OK (r3)" in capsys.readouterr().out


def test_real_registry_window_is_green():
    assert gr.cmd_check(0) == 0


def test_anchors_lead_the_real_window():
    from tf_datapipeline_spark import registry

    assert registry.GATE_ORDER[: len(registry.GATE_ANCHORS)] == list(
        registry.GATE_ANCHORS
    )
    oracled = set(registry.oracle_sql())
    assert all(a in oracled for a in registry.GATE_ANCHORS)
