"""End-to-end LPIPS checkpoint-layout test (VERDICT r2 weak #6).

Real richzhang/torchvision weights are unobtainable in this environment
(zero egress, no caches), so what CAN be proven is everything except the
literal ImageNet numbers: synthetic checkpoints are written in the EXACT
torch-hub file layouts (torchvision `alexnet-owt`/`vgg16` state dicts with
convs at `features.{0,3,6,8,10}` / `features.{0,2,5,7,10,12,14,17,19,21,
24,26,28}`, richzhang v0.1 heads as `lin{i}.model.1.weight` [1,C,1,1]),
pushed through `scripts/convert_lpips_weights.py`'s offline path, and the
resulting npz-driven JAX forward is compared against an independent torch
transliteration of the reference LPIPS module
(`src/utils/eval_utils.py:120-285`: BaseNet z-score, 1-indexed
target_layers taps, normalize_activation eps-on-norm, LinLayers 1x1 conv,
spatial mean, sum over taps). A transposed weight, wrong tap index, or
misplaced pool cannot pass this.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from convert_lpips_weights import (ALEX_FEATURE_CONV_IDX,
                                   VGG16_FEATURE_CONV_IDX, convert)
from rodygs_tpu.evalsuite.lpips import lpips_fn


def _alex_features():
    # torchvision.models.alexnet().features, layer-for-layer
    return nn.Sequential(
        nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(inplace=True),
        nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(inplace=True),
        nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(inplace=True),
        nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(inplace=True),
        nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(inplace=True),
        nn.MaxPool2d(3, 2))


def _vgg16_features():
    # torchvision.models.vgg16().features (config "D")
    layers, in_c = [], 3
    for v in [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_c, v, 3, 1, 1), nn.ReLU(inplace=True)]
            in_c = v
    return nn.Sequential(*layers)


def _make_backbone_ckpt(path, features, extra_keys=True, seed=0):
    """State dict in the exact torchvision full-model layout (classifier
    junk included, as in the real alexnet-owt-7be5be79.pth)."""
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for i, m in enumerate(features):
        if isinstance(m, nn.Conv2d):
            sd[f"features.{i}.weight"] = torch.randn(
                m.weight.shape, generator=g) * 0.05
            sd[f"features.{i}.bias"] = torch.randn(
                m.bias.shape, generator=g) * 0.05
    if extra_keys:
        sd["classifier.1.weight"] = torch.zeros(8, 8)
        sd["classifier.1.bias"] = torch.zeros(8)
    torch.save(sd, path)
    return sd


def _make_heads_ckpt(path, channels, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {f"lin{i}.model.1.weight":
          torch.rand((1, c, 1, 1), generator=g) * 0.1
          for i, c in enumerate(channels)}
    torch.save(sd, path)
    return sd


class _RefLPIPS(nn.Module):
    """Transliteration of the reference LPIPS (eval_utils.py:120-285)."""

    def __init__(self, features, target_layers, backbone_sd, heads_sd):
        super().__init__()
        self.layers = features
        self.layers.load_state_dict(
            {k.removeprefix("features."): v for k, v in backbone_sd.items()
             if k.startswith("features.")})
        self.target_layers = target_layers
        self.register_buffer("mean",
                             torch.tensor([-0.030, -0.088, -0.188])
                             .reshape(1, 3, 1, 1))
        self.register_buffer("std",
                             torch.tensor([0.458, 0.448, 0.450])
                             .reshape(1, 3, 1, 1))
        self.lin = nn.ModuleList()
        for i in range(5):
            w = heads_sd[f"lin{i}.model.1.weight"]
            conv = nn.Conv2d(w.shape[1], 1, 1, 1, 0, bias=False)
            with torch.no_grad():
                conv.weight.copy_(w)
            self.lin.append(nn.Sequential(nn.Identity(), conv))

    def _feats(self, x):
        x = (x - self.mean) / self.std
        out = []
        for i, (_, layer) in enumerate(self.layers._modules.items(), 1):
            x = layer(x)
            if i in self.target_layers:
                norm = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
                out.append(x / (norm + 1e-10))
            if len(out) == len(self.target_layers):
                break
        return out

    @torch.no_grad()
    def forward(self, x, y):
        fx, fy = self._feats(x), self._feats(y)
        diff = [(a - b) ** 2 for a, b in zip(fx, fy)]
        res = [l(d).mean((2, 3), True) for d, l in zip(diff, self.lin)]
        return torch.sum(torch.cat(res, 0), 0, True)


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("lpips")
    alex_sd = _make_backbone_ckpt(tmp / "alexnet.pth", _alex_features(),
                                  seed=1)
    vgg_sd = _make_backbone_ckpt(tmp / "vgg16.pth", _vgg16_features(),
                                 seed=2)
    heads = tmp / "heads"
    heads.mkdir()
    alex_heads = _make_heads_ckpt(heads / "alex.pth",
                                  [64, 192, 384, 256, 256], seed=3)
    vgg_heads = _make_heads_ckpt(heads / "vgg.pth",
                                 [64, 128, 256, 512, 512], seed=4)
    out = tmp / "lpips_weights.npz"
    convert(str(out), alex_pth=str(tmp / "alexnet.pth"),
            vgg_pth=str(tmp / "vgg16.pth"), heads_dir=str(heads))
    return {"npz": str(out), "alex_sd": alex_sd, "vgg_sd": vgg_sd,
            "alex_heads": alex_heads, "vgg_heads": vgg_heads}


class TestLpipsCheckpointLayout:
    def test_converter_indices_match_architectures(self):
        """The conv positions the converter assumes are exactly the Conv2d
        positions of the (transliterated) torchvision features stacks."""
        assert [i for i, m in enumerate(_alex_features())
                if isinstance(m, nn.Conv2d)] == ALEX_FEATURE_CONV_IDX
        assert [i for i, m in enumerate(_vgg16_features())
                if isinstance(m, nn.Conv2d)] == VGG16_FEATURE_CONV_IDX

    @pytest.mark.parametrize("net", ["alex", "vgg"])
    def test_converted_npz_matches_reference_module(self, converted, net):
        fn = lpips_fn(net, converted["npz"])
        assert fn is not None
        if net == "alex":
            ref = _RefLPIPS(_alex_features(), [2, 5, 8, 10, 12],
                            converted["alex_sd"], converted["alex_heads"])
        else:
            ref = _RefLPIPS(_vgg16_features(), [4, 9, 16, 23, 30],
                            converted["vgg_sd"], converted["vgg_heads"])
        rng = np.random.default_rng(5)
        for _ in range(2):
            a = rng.random((64, 64, 3), np.float32)
            b = np.clip(a + rng.normal(0, 0.15, a.shape), 0, 1) \
                .astype(np.float32)
            mine = float(fn(a, b))
            ta = torch.tensor(a).permute(2, 0, 1)[None]
            tb = torch.tensor(b).permute(2, 0, 1)[None]
            ref_v = float(ref(ta, tb))
            np.testing.assert_allclose(mine, ref_v, rtol=2e-4, atol=1e-5)

    def test_transposed_checkpoint_rejected(self, tmp_path):
        """A channels-transposed conv weight must fail conversion loudly."""
        sd = {}
        for i, m in enumerate(_alex_features()):
            if isinstance(m, nn.Conv2d):
                w = torch.randn(m.weight.shape)
                sd[f"features.{i}.weight"] = w.transpose(0, 1)
                sd[f"features.{i}.bias"] = torch.randn(m.bias.shape)
        torch.save(sd, tmp_path / "bad.pth")
        with pytest.raises(AssertionError, match="transposed"):
            convert(str(tmp_path / "out.npz"),
                    alex_pth=str(tmp_path / "bad.pth"))


class TestLpipsBootstrap:
    """The one-command checksum-pinned bootstrap (VERDICT r3 #9): manifest
    drives the downloads, sha256 pins gate the conversion."""

    @staticmethod
    def _manifest_for(tmp_path, sources, pins):
        import hashlib
        import json
        entries = {}
        for key, src in sources.items():
            digest = hashlib.sha256(src.read_bytes()).hexdigest()
            entry = {"url": f"fake://{key}", "sha256_prefix": None,
                     "sha256_full": None, "dest": {
                         "alex_backbone": "alexnet.pth",
                         "vgg_backbone": "vgg16.pth",
                         "alex_head": "heads/alex.pth",
                         "vgg_head": "heads/vgg.pth"}[key]}
            if pins == "full":
                entry["sha256_full"] = digest
            elif pins == "prefix":
                entry["sha256_prefix"] = digest[:8]
            elif pins == "wrong":
                entry["sha256_full"] = "0" * 64
            entries[key] = entry
        mp = tmp_path / "manifest.json"
        mp.write_text(json.dumps({"files": entries}))
        return mp

    @pytest.fixture()
    def sources(self, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        _make_backbone_ckpt(src / "alexnet.pth", _alex_features(), seed=1)
        _make_backbone_ckpt(src / "vgg16.pth", _vgg16_features(), seed=2)
        _make_heads_ckpt(src / "alex.pth", [64, 192, 384, 256, 256], seed=3)
        _make_heads_ckpt(src / "vgg.pth", [64, 128, 256, 512, 512], seed=4)
        return {"alex_backbone": src / "alexnet.pth",
                "vgg_backbone": src / "vgg16.pth",
                "alex_head": src / "alex.pth",
                "vgg_head": src / "vgg.pth"}

    def _patch_fetch(self, monkeypatch, sources):
        import shutil
        import urllib.request

        def fake_retrieve(url, dest):
            shutil.copy(sources[url.removeprefix("fake://")], dest)

        monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)

    @pytest.mark.parametrize("pins", ["full", "prefix"])
    def test_bootstrap_verifies_and_converts(self, tmp_path, monkeypatch,
                                             sources, pins):
        from convert_lpips_weights import bootstrap
        self._patch_fetch(monkeypatch, sources)
        mp = self._manifest_for(tmp_path, sources, pins)
        out = tmp_path / "w.npz"
        bootstrap(str(tmp_path / "cache"), str(out),
                  manifest_path=str(mp))
        assert lpips_fn("alex", str(out)) is not None

    def test_bootstrap_rejects_hash_mismatch(self, tmp_path, monkeypatch,
                                             sources):
        from convert_lpips_weights import bootstrap
        self._patch_fetch(monkeypatch, sources)
        mp = self._manifest_for(tmp_path, sources, "wrong")
        with pytest.raises(SystemExit, match="mismatch"):
            bootstrap(str(tmp_path / "cache"), str(tmp_path / "w.npz"),
                      manifest_path=str(mp))

    def test_bootstrap_requires_pin_or_flag(self, tmp_path, monkeypatch,
                                            sources):
        from convert_lpips_weights import bootstrap
        self._patch_fetch(monkeypatch, sources)
        mp = self._manifest_for(tmp_path, sources, "none")
        with pytest.raises(SystemExit, match="allow_unpinned"):
            bootstrap(str(tmp_path / "cache"), str(tmp_path / "w.npz"),
                      manifest_path=str(mp))
        bootstrap(str(tmp_path / "cache"), str(tmp_path / "w.npz"),
                  allow_unpinned=True, manifest_path=str(mp))

    def test_bootstrap_pin_records_hashes_then_verifies(self, tmp_path,
                                                        monkeypatch, sources):
        """--pin (trust-on-first-use): the first bootstrap accepts unpinned
        entries, writes their sha256_full into the manifest, and a SECOND
        bootstrap verifies against the recorded pins by default — and
        still rejects a rotated file."""
        import hashlib
        import json

        from convert_lpips_weights import bootstrap
        self._patch_fetch(monkeypatch, sources)
        mp = self._manifest_for(tmp_path, sources, "none")
        out = tmp_path / "w.npz"
        bootstrap(str(tmp_path / "cache"), str(out), manifest_path=str(mp),
                  pin=True)
        files = json.loads(mp.read_text())["files"]
        for key, src in sources.items():
            assert files[key]["sha256_full"] == hashlib.sha256(
                src.read_bytes()).hexdigest()
        # second run: fully pinned, no flags needed
        bootstrap(str(tmp_path / "cache2"), str(out), manifest_path=str(mp))
        # rotated upstream file now fails even WITH --pin
        sources["alex_head"].write_bytes(b"rotated")
        with pytest.raises(SystemExit, match="mismatch"):
            bootstrap(str(tmp_path / "cache3"), str(out),
                      manifest_path=str(mp), pin=True)

    def test_repo_manifest_parses_and_covers_all_roles(self):
        import json
        mp = (Path(__file__).resolve().parents[1] / "scripts"
              / "lpips_manifest.json")
        files = json.loads(mp.read_text())["files"]
        assert set(files) == {"alex_backbone", "vgg_backbone",
                              "alex_head", "vgg_head"}
        for spec in files.values():
            assert spec["url"].startswith("https://")
        # torch-hub files carry their prefix pin in the filename
        for key in ("alex_backbone", "vgg_backbone"):
            assert files[key]["sha256_prefix"] in files[key]["url"]
