"""convert_all round trip: downloaded-.pth directory -> one command ->
registry-loadable weights directory (round-4 verdict item 6).

The source directory is populated with checkpoints that carry the REAL
released layouts: every .pth is ``torch.save``-d from the reference's own
torch modules (loaded live via _ref_loader) under the exact filenames the
reference downloads — so each key map is exercised against the real key
inventory (spectral-norm weight_orig/u/v aux keys, fastai module indices,
the DDColor wheel layout via the transcribed upstream oracle, the
remasternet ``.pth.tar``), not a synthetic list.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _ref_loader import load_ref_module
from havc_tpu.models import convert


def _save(module_or_sd, path):
    sd = (module_or_sd.state_dict()
          if hasattr(module_or_sd, "state_dict") else module_or_sd)
    torch.save(sd, path)


@pytest.fixture(scope="module")
def src_dir(tmp_path_factory):
    """Reference-layout checkpoint directory (all 10 recognized files)."""
    d = tmp_path_factory.mktemp("ref_checkpoints")
    torch.manual_seed(0)

    # DeOldify: wide (video/stable) + deep (artistic), real fastai layout
    # incl. spectral-norm aux keys
    from test_ref_parity_deoldify import _build_ref

    wide = _build_ref("wide")
    _save(wide, d / "ColorizeVideo_gen.pth")
    _save(wide, d / "ColorizeStable_gen.pth")
    _save(_build_ref("deep"), d / "ColorizeArtistic_gen.pth")

    # Zhang: the released files are the module state_dicts
    ecc = load_ref_module("vsdeoldify.colorization.colorizers.eccv16")
    sig = load_ref_module("vsdeoldify.colorization.colorizers.siggraph17")
    _save(ecc.ECCVGenerator(), d / "colorization_release_v2-9b330a0b.pth")
    _save(sig.SIGGRAPHGenerator(), d / "siggraph17-df00044c.pth")

    # DDColor: upstream wheel layout via the transcribed oracle
    from _ddcolor_oracle import build_ddcolor_oracle

    unet = load_ref_module("vsdeoldify.deoldify.unet")
    dl = load_ref_module("vsdeoldify.deoldify.layers")
    fl = load_ref_module("vsdeoldify.fastai.layers")
    dd = build_ddcolor_oracle(unet, dl, fl)
    _save(dd, d / "ddcolor_artistic.pth")
    _save(dd, d / "ddcolor_modelscope.pth")

    # Deep-Exemplar: three files, reference module layouts
    nl = load_ref_module("vsdeoldify.deepex.models.NonlocalNet")
    cvd = load_ref_module("vsdeoldify.deepex.models.ColorVidNet")
    _save(nl.VGG19_pytorch(), d / "vgg19_conv.pth")
    _save(nl.WarpNet(1), d / "nonlocal_net_iter_76000.pth")
    _save(cvd.ColorVidNet(7), d / "colornet_iter_76000.pth")

    # ColorMNet: the reference network with the DINOv2 backbone inline
    # (the released file carries it the same way)
    from test_ref_parity_colormnet_e2e import ref_network

    net = ref_network.__wrapped__()
    _save(net, d / "DINOv2FeatureV6_LocalAtten_s2_154000.pth")

    # DeepRemaster: torch.save named .pth.tar like the released file
    rm = load_ref_module("vsdeoldify.remaster.model.remasternet")
    _save(rm.NetworkC(), d / "remasternet.pth.tar")
    return d


@pytest.mark.slow
def test_convert_all_roundtrip(src_dir, tmp_path):
    out = tmp_path / "weights"
    report = convert.convert_all(str(src_dir), str(out), strict=True)
    assert all(v == "converted" for v in report.values()), report
    assert len(report) == len(convert.CONVERT_ALL_PLAN)

    # every converted npz loads through the PUBLIC registry
    from havc_tpu import engines

    engines.set_weights_dir(str(out))
    try:
        reg = engines.registry
        for fam in ("colormnet", "deepex", "remaster"):
            assert reg.exemplar_tree(fam) is not None, fam
        for name in ("eccv16", "siggraph17"):
            m, p = reg.zhang(name)
            assert p is not None
        for name in ("artistic", "modelscope"):
            m, p = reg.ddcolor(name)
            assert p is not None
        for name in ("video", "stable", "artistic"):
            m, p = reg.deoldify(name)
            assert p is not None
    finally:
        engines.set_weights_dir(None)


def test_convert_all_reports_missing(tmp_path):
    src = tmp_path / "empty"
    src.mkdir()
    report = convert.convert_all(str(src), str(tmp_path / "w"))
    assert all(v.startswith("missing:") for v in report.values())
    with pytest.raises(FileNotFoundError):
        convert.convert_all(str(src), str(tmp_path / "w2"), strict=True)
