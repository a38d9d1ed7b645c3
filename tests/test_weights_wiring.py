"""set_weights_dir must reach every engine family — including the exemplar
engines (round-1 gap: ColorMNet/DeepEx/Remaster hard-coded random init)."""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import havc_tpu.engines as engines
from havc_tpu.models import convert


@pytest.fixture(autouse=True)
def _restore_registry():
    yield
    engines.set_weights_dir(None)


def test_exemplar_tree_roundtrip(tmp_path):
    params = {
        "params": {
            "key_encoder": {"conv": {"kernel": np.ones((3, 3, 1, 2), np.float32)}},
            "key_proj": {"b": np.arange(4, dtype=np.float32)},
        }
    }
    convert.save_params_npz(params, tmp_path / "colormnet.npz")
    engines.set_weights_dir(str(tmp_path))
    tree = engines.registry.exemplar_tree("colormnet")
    assert tree is not None
    np.testing.assert_array_equal(
        np.asarray(tree["params"]["key_encoder"]["conv"]["kernel"]),
        params["params"]["key_encoder"]["conv"]["kernel"],
    )
    assert engines.registry.exemplar_tree("missing") is None


def test_colormnet_engine_loads_registry_weights(tmp_path, monkeypatch):
    """A 'full'-config ColorMNetEngine must take its params from
    <weights_dir>/colormnet.npz instead of random init."""
    from havc_tpu import exemplar

    groups = ["key_encoder", "key_proj", "value_encoder", "decoder",
              "short_term_attn"]
    params = {
        "params": {
            g: {"w": np.full((2, 2), i, np.float32)}
            for i, g in enumerate(groups)
        }
    }
    convert.save_params_npz(params, tmp_path / "colormnet.npz")
    engines.set_weights_dir(str(tmp_path))
    engines.registry.random_init_used = False

    eng = exemplar.ColorMNetEngine(config="full", work_size=(64, 64))
    assert not engines.registry.random_init_used
    np.testing.assert_array_equal(
        np.asarray(eng.p_proj["params"]["w"]), np.full((2, 2), 1, np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(eng.p_attn["params"]["w"]), np.full((2, 2), 4, np.float32)
    )
    assert eng.g16_hw == (4, 4)


def test_deepex_remaster_engines_load_registry_weights(tmp_path):
    from havc_tpu import exemplar

    convert.save_params_npz(
        {"params": {
            "vgg": {"w": np.ones((2,), np.float32)},
            "warpnet": {"w": np.full((2,), 2, np.float32)},
            "colorvid": {"w": np.full((2,), 3, np.float32)},
        }},
        tmp_path / "deepex.npz",
    )
    convert.save_params_npz(
        {"params": {"down1": {"w": np.full((2,), 4, np.float32)}}},
        tmp_path / "remaster.npz",
    )
    engines.set_weights_dir(str(tmp_path))
    engines.registry.random_init_used = False
    dxe = exemplar.DeepExEngine(speed="fast")
    rme = exemplar.RemasterEngine()
    assert not engines.registry.random_init_used
    np.testing.assert_array_equal(
        np.asarray(dxe.p_warp["params"]["w"]), np.full((2,), 2, np.float32))
    np.testing.assert_array_equal(
        np.asarray(rme.params["params"]["down1"]["w"]),
        np.full((2,), 4, np.float32))


def test_deepex_remaster_random_flag(tmp_path):
    """Without converted weights the registry records random init was used
    (observability: the API can warn instead of silently colorizing with
    noise)."""
    from havc_tpu import exemplar

    engines.set_weights_dir(str(tmp_path))  # empty dir: no npz files
    engines.registry.random_init_used = False
    exemplar._ENGINE_CACHE.clear()
    eng = exemplar.ColorMNetEngine(config="micro", work_size=(32, 32))
    assert engines.registry.random_init_used


def test_engine_config_resolution(tmp_path):
    """None/'auto' resolves to 'full' when a converted ColorMNet checkpoint
    is configured and to 'micro' otherwise; an explicit 'micro' with
    weights present warns (round-2 verdict: silent random-weights trap)."""
    import warnings as _warnings

    from havc_tpu import exemplar

    assert exemplar.resolve_engine_config(None) == "micro"
    assert exemplar.resolve_engine_config("full") == "full"

    params = {"params": {"key_proj": {"w": np.ones((2, 2), np.float32)}}}
    convert.save_params_npz(params, tmp_path / "colormnet.npz")
    engines.set_weights_dir(str(tmp_path))
    assert exemplar.resolve_engine_config(None) == "full"
    assert exemplar.resolve_engine_config("auto") == "full"
    with pytest.warns(UserWarning, match="micro"):
        assert exemplar.resolve_engine_config("micro") == "micro"


def test_random_fallback_warns(tmp_path):
    """weights_dir set but engine checkpoint missing -> loud warning."""
    from havc_tpu import exemplar

    engines.set_weights_dir(str(tmp_path))  # empty dir
    exemplar._ENGINE_CACHE.clear()
    with pytest.warns(UserWarning, match="RANDOM init"):
        exemplar.DeepExEngine(speed="fast")


def test_vivid_constants_match_reference():
    """Vivid tweak constants pinned to the reference
    (vsslib/constants.py:76-79): DeepRemaster pre hue+3/sat*1.30, post
    hue+5/sat*1.15; DeepEx ab*1.25; ColorMNet reset-only."""
    from havc_tpu import exemplar

    assert exemplar.DEF_VIVID_HUE_LOW == 3.0
    assert exemplar.DEF_VIVID_SAT_HIGH == 1.30
    assert exemplar.DEF_VIVID_HUE_HIGH == 5.0
    assert exemplar.DEF_VIVID_SAT_LOW == 1.15
    import inspect

    src = inspect.getsource(exemplar._exemplar_dispatch)
    # the pre-tweak is DeepRemaster-only (ex_model == 2); ColorMNet (0)
    # must not pre-tweak its references (colormnet/__init__.py:54)
    assert "render_vivid and ex_model == 2" in src
