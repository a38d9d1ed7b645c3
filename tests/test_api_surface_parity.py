"""Public-API surface parity vs the reference (AST-level, no imports).

Guards the round-3 milestone: every public ``HAVC_*``/``ddeoldify*``
function of the reference (vsdeoldify/__init__.py + HAVC_read_video in
havc_utils.py) exists here with every reference parameter name accepted,
and shared parameter defaults match (string compare case-insensitive —
the reference's preset strings are case-insensitive too).
"""
import ast
import os

import pytest

REF_ROOT = "/root/reference/vsdeoldify"
REPO_FILES = (
    os.path.join(os.path.dirname(__file__), "..", "havc_tpu", "api.py"),
    os.path.join(os.path.dirname(__file__), "..", "havc_tpu", "exemplar",
                 "__init__.py"),
)

# repo-only knobs (TPU batching / engine scale) exempt from default compare
IGNORE_DEFAULTS = {"batch_size", "use_pallas", "engine_config"}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not available"
)


def _functions(path):
    tree = ast.parse(open(path).read())
    out = {}
    for node in ast.walk(tree):
        if not isinstance(node, ast.FunctionDef):
            continue
        a = node.args
        params = [x.arg for x in a.posonlyargs + a.args + a.kwonlyargs]
        if a.kwarg:
            params.append("**")
        defaults = {}
        pos = a.posonlyargs + a.args
        for arg, default in zip(pos[len(pos) - len(a.defaults):], a.defaults):
            try:
                defaults[arg.arg] = ast.literal_eval(default)
            except Exception:
                defaults[arg.arg] = Ellipsis
        # prefer the fullest definition per name (impl over delegator)
        if node.name not in out or len(params) > len(out[node.name][0]):
            out[node.name] = (params, defaults)
    return out


def _public(funcs):
    return {k: v for k, v in funcs.items()
            if k.startswith(("HAVC_", "ddeoldify"))}


def _norm(v):
    return v.lower() if isinstance(v, str) else v


def _load():
    ref = _public(_functions(os.path.join(REF_ROOT, "__init__.py")))
    utils = _functions(os.path.join(REF_ROOT, "havc_utils.py"))
    if "HAVC_read_video" in utils:
        ref["HAVC_read_video"] = utils["HAVC_read_video"]
    repo = {}
    for p in REPO_FILES:
        for k, v in _public(_functions(p)).items():
            if k not in repo or len(v[0]) > len(repo[k][0]):
                repo[k] = v
    return ref, repo


def test_every_public_function_exists():
    ref, repo = _load()
    missing = sorted(set(ref) - set(repo))
    assert not missing, f"reference API missing from repo: {missing}"


def test_every_reference_param_accepted():
    ref, repo = _load()
    problems = []
    for name in sorted(set(ref) & set(repo)):
        rparams = ref[name][0]
        mparams, _ = repo[name]
        if "**" in mparams:
            continue
        gone = [p for p in rparams
                if p not in ("self", "clip", "**") and p not in mparams]
        # the clip arg may be renamed only for the first positional
        if gone:
            problems.append(f"{name}: {gone}")
    assert not problems, "params not accepted: " + "; ".join(problems)


def test_shared_defaults_match():
    ref, repo = _load()
    drift = []
    for name in sorted(set(ref) & set(repo)):
        rdef = ref[name][1]
        mdef = repo[name][1]
        for p, dv in rdef.items():
            if p in IGNORE_DEFAULTS or dv is Ellipsis:
                continue
            if p in mdef and mdef[p] is not Ellipsis \
                    and _norm(mdef[p]) != _norm(dv):
                drift.append(f"{name}.{p}: ref={dv!r} repo={mdef[p]!r}")
    assert not drift, "default drift: " + "; ".join(drift)
