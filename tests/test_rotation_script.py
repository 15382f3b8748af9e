"""Round-start rotation helper (scripts/rotate_window.py): the window
swap is mechanical and mistake-prone — these tests pin its rules on a
synthetic correctness file + registry source so round-5 can run it
blind."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "rotate_window",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "rotate_window.py",
    ),
)
rw = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(rw)


def test_green_names_rules():
    correctness = {
        "a01_ok": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
        "b02_red": {"rows_match": True, "schema_match": True, "hash_match": False, "err": None},
        "c03_err": {"rows_match": False, "hash_match": True, "err": "boom"},
        "d04_rows_only": {"rows_match": True, "hash_match": None, "err": None},
        "x_e05_prefixed": {"rows_match": True, "hash_match": True, "err": None},
    }
    greens = rw.green_names(correctness)
    assert greens == {"a01_ok", "d04_rows_only", "e05_prefixed"}


def test_rewrite_roundtrip_preserves_structure():
    src = open(rw.REGISTRY, encoding="utf-8").read()
    rotated = rw._parse_set(rw._ROTATED_RE.search(src).group(2))
    pending = rw._parse_set(rw._PENDING_RE.search(src).group(2))
    out = rw.rewrite(src, rotated, pending)
    # identical sets → identical (sorted) literals parse back equal
    assert rw._parse_set(rw._ROTATED_RE.search(out).group(2)) == rotated
    assert rw._parse_set(rw._PENDING_RE.search(out).group(2)) == pending
    # and the rewritten file still compiles
    compile(out, "registry.py", "exec")


def test_plan_rotation_moves_greens_and_unparks():
    src = open(rw.REGISTRY, encoding="utf-8").read()
    import sys

    sys.path.insert(0, rw.REPO)
    from spark_dynamodb_spark.registry import load_all

    specs = load_all().specs()
    window = sorted(n for n in specs if not n.startswith(("x_", "z_", "zz_")))
    # pretend the driver proved every window entry green
    greens = set(window)
    rotated, pending, info = rw.plan_rotation(src, greens, 50)
    assert info["window_red_staying"] == []
    assert set(info["window_green_rotating"]) == greens
    assert len(info["unparking"]) == min(50, info["still_parked"] + len(info["unparking"]))
    # unparked names left the pending set and joined neither-set limbo
    for n in info["unparking"]:
        assert n not in pending and n not in rotated
    # every green is now in the rotated set
    assert greens <= rotated


def test_rows_only_parked_names_never_rotate_or_unpark():
    """The zz_ (ROWS_ONLY_VERIFIED) entries are permanently parked:
    they are not in the window (so plan_rotation never sees them as
    red-staying), never enter ROTATED_GREEN_R1/ROTATION_PENDING, and
    resolve() accepts the zz_ spelling."""
    import sys

    sys.path.insert(0, rw.REPO)
    from spark_dynamodb_spark.registry import (
        ROTATED_GREEN_R1,
        ROTATION_PENDING,
        ROWS_ONLY_VERIFIED,
        load_all,
    )

    assert ROWS_ONLY_VERIFIED == {
        "b13_agg_approx_distinct",
        "b56_distinct_over_window_approx",
        # round 14: float MFCC parked after its r13 rows-only driver
        # row (banded pytest is its strong check)
        "c122_audio_mfcc",
        # round 15: the r14 float evals, parked after their r14
        # rows-only driver rows (fsum-banded pytests are the strong
        # checks)
        "c125_ann_cosine_float_serving",
        "c126_unigram_perplexity_eval",
    }
    assert not ROWS_ONLY_VERIFIED & ROTATED_GREEN_R1
    assert not ROWS_ONLY_VERIFIED & ROTATION_PENDING
    reg = load_all()
    specs = reg.specs()
    for n in ROWS_ONLY_VERIFIED:
        assert f"zz_{n}" in specs, f"zz_{n} missing from specs()"
        assert reg.resolve(f"zz_{n}").name == n
        # rows-only by construction: no oracle CAN exist
        assert reg.resolve(n).oracle is None

    src = open(rw.REGISTRY, encoding="utf-8").read()
    # a y_ entry is green in every round (rows-only row) — the
    # rotation plan must leave the rotation sets untouched by it
    rotated, pending, info = rw.plan_rotation(
        src, set(ROWS_ONLY_VERIFIED), 50
    )
    assert not set(info["window_green_rotating"]) & ROWS_ONLY_VERIFIED
    assert not set(info["unparking"]) & ROWS_ONLY_VERIFIED


def test_stalest_first_spill_and_keep(tmp_path):
    """VERDICT r14 #1: when the parking set is dry and window slots
    remain, the spill must cycle the z_ greens whose last REAL driver
    row is OLDEST (ties lexical) back into the window — not the
    lexically-first names the driver would otherwise re-verify every
    round. --keep names stay unprefixed even when green."""
    import json

    # synthetic correctness history: a green in r2 and r5, b green in
    # r3 only, c green in r5 only (rows-only), d never green
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "a01_x": {"hash_match": True, "rows_match": True, "err": None},
        "d04_x": {"hash_match": False, "rows_match": False, "err": "boom"},
    }))
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        "b02_x": {"hash_match": True, "rows_match": True, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps({
        "z_a01_x": {"hash_match": True, "rows_match": True, "err": None},
        "c03_x": {"err": "no_oracle", "rows_match": None, "spark_rows": 7},
    }))
    ages = rw.last_green_rounds(str(tmp_path))
    assert ages == {"a01_x": 5, "b02_x": 3, "c03_x": 5}

    # registry-shaped source with 3 rotated greens, no pending
    src = (
        "ROTATED_GREEN_R1 = frozenset(\n    {\n"
        '        "a01_x",\n        "b02_x",\n        "c03_x",\n'
        "    }\n)\n"
        "ROTATION_PENDING: frozenset[str] = frozenset(\n    {\n    }\n)\n"
    )
    import sys

    sys.path.insert(0, rw.REPO)
    from spark_dynamodb_spark.registry import load_all

    window_names = sorted(
        n for n in load_all().specs() if not n.startswith(("x_", "z_", "zz_"))
    )
    greens = set(window_names)
    keep = frozenset(window_names[:2])
    # window of 4: the 2 kept names stay, leaving exactly 2 spare
    # slots for the stalest-first spill
    rotated, pending, info = rw.plan_rotation(
        src, greens, 4, keep=keep, ages=ages
    )
    # kept names never rotate, and are reported separately
    assert info["window_kept"] == sorted(keep)
    assert not set(info["window_green_rotating"]) & keep
    # 2 spare slots -> the two STALEST z_ greens un-rotate:
    # b02_x (r3) first, then the lexical tie-break among the r5 pair
    assert info["unrotating_stalest"] == ["b02_x", "a01_x"]
    assert "b02_x" not in rotated and "a01_x" not in rotated
    assert "c03_x" in rotated
    # without ages (legacy mode) the spill stays untouched
    r2, _, info2 = rw.plan_rotation(src, greens, 4)
    assert info2["unrotating_stalest"] == []
    assert {"a01_x", "b02_x", "c03_x"} <= r2
