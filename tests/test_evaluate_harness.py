"""The published-methodology harness (examples/evaluate_de2000.py) must be
demonstrably runnable: it emits the reference README-style per-image
markdown table plus a machine-readable JSON summary (round-4 verdict
item 6).  Random weights keep it cheap; the dE values are meaningless but
the table/JSON contract is what's under test."""
import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SCRIPT = os.path.join(_REPO, "examples", "evaluate_de2000.py")


@pytest.mark.slow
def test_evaluate_de2000_emits_readme_style_table():
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    r = subprocess.run(
        [sys.executable, _SCRIPT, "--allow-random", "--count", "2",
         "--max-side", "96", "--configs", "zhang"],
        capture_output=True, text=True, timeout=900, env=env, cwd=_REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    # markdown table: header + separator + 2 image rows + Avg row
    assert any(ln.startswith("| Test # |") for ln in lines)
    assert any("**Avg(dE)**" in ln for ln in lines)
    img_rows = [ln for ln in lines if "Image_" in ln and ln.startswith("|")]
    assert len(img_rows) == 2
    summary = json.loads(lines[-1])
    assert summary["metric"] == "ciede2000_vs_ground_truth"
    assert summary["images"] == 2
    assert summary["weights"] == "RANDOM (demo)"
    assert "zhang" in summary["averages"]


def test_config_tables_cover_both_published_sets():
    """The config table must carry every configuration of both published
    comparison sets (README.md:243-268 set #1, :294-319 set #2) with the
    reference averages on record."""
    sys.path.insert(0, os.path.join(_REPO, "examples"))
    import evaluate_de2000 as ev

    for c in ("D+D", "DD", "DS", "DV"):
        assert c in ev.CONFIGS and c in ev.REFERENCE_AVERAGES
    for c in ("DS+DD", "DA+DDs", "DA+DD", "DDs", "DA"):
        assert c in ev.CONFIGS and c in ev.REFERENCE_AVERAGES
    # set-2 parameterizations per README.md:286-300
    assert ev.CONFIGS["DA"] == dict(method=0, deoldify_p=(2, 30, 1.0, 0.0))
    assert ev.CONFIGS["DDs"]["ddcolor_p"][0] == 0  # ModelScope
    assert ev.CONFIGS["DS+DD"]["deoldify_p"][:2] == (1, 30)
    assert ev.REFERENCE_AVERAGES["DS+DD"] == 8.0
