"""AFNO (FourCastNet v1) parity vs the reference's own afnonet.py.

The reference module imports cleanly through tests/ref_compat (timm stub);
weights are randomized, converted (convert_afno_state_dict), and forward
outputs compared — covering the block-diagonal spectral MLP's kept-mode
region, double-skip block wiring, patch embed/head layouts, and the dead
final norm."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from msfno_tpu.models.afno.afnonet import AFNONet as MyAFNO  # noqa: E402
from msfno_tpu.models.afno.afnonet import PrecipNet as MyPrecip  # noqa: E402
from msfno_tpu.models.convert import convert_afno_state_dict  # noqa: E402
from tests.ref_compat import import_reference_afnonet  # noqa: E402

KW = dict(img_size=(16, 32), patch_size=(4, 4), in_chans=3, out_chans=3,
          embed_dim=16, depth=2, num_blocks=4)


def _randomize(net, seed=0):
    g = torch.Generator().manual_seed(seed)
    pnames = {k for k, _ in net.named_parameters()}
    sd = {
        k: torch.randn(v.shape, generator=g) * 0.05 if k in pnames else v
        for k, v in net.state_dict().items()
    }
    net.load_state_dict(sd)
    net.eval()
    return sd


class TestAFNOParity:
    def test_forward_parity(self):
        afnonet = import_reference_afnonet()
        net = afnonet.AFNONet(**KW)
        sd = _randomize(net)
        g = torch.Generator().manual_seed(1)
        x = torch.randn(2, 3, 16, 32, generator=g)
        with torch.no_grad():
            ref_out = net(x).numpy()
        res = convert_afno_state_dict(
            {k: v.numpy() for k, v in sd.items()},
            img_size=KW["img_size"], patch_size=KW["patch_size"],
        )
        assert res["unconverted"] == [], res["unconverted"]
        my = MyAFNO(**KW)
        out = np.asarray(
            jax.jit(my.apply)(
                {"params": res["params"]},
                jnp.asarray(np.moveaxis(x.numpy(), 1, -1)),
            )
        )
        rel = np.linalg.norm(ref_out - np.moveaxis(out, -1, 1)) / (
            np.linalg.norm(ref_out)
        )
        assert rel < 1e-4, rel

    def test_hard_thresholding(self):
        """Kept-mode truncation (hard_thresholding_fraction < 1)."""
        afnonet = import_reference_afnonet()
        kw = dict(KW, hard_thresholding_fraction=0.5)
        net = afnonet.AFNONet(**kw)
        sd = _randomize(net, seed=2)
        g = torch.Generator().manual_seed(3)
        x = torch.randn(1, 3, 16, 32, generator=g)
        with torch.no_grad():
            ref_out = net(x).numpy()
        res = convert_afno_state_dict(
            {k: v.numpy() for k, v in sd.items()},
            img_size=KW["img_size"], patch_size=KW["patch_size"],
        )
        my = MyAFNO(**kw)
        out = np.asarray(
            my.apply(
                {"params": res["params"]},
                jnp.asarray(np.moveaxis(x.numpy(), 1, -1)),
            )
        )
        rel = np.linalg.norm(ref_out - np.moveaxis(out, -1, 1)) / (
            np.linalg.norm(ref_out)
        )
        assert rel < 1e-4, rel

    def test_precipnet_parity(self):
        afnonet = import_reference_afnonet()
        backbone = afnonet.AFNONet(**KW)
        net = afnonet.PrecipNet(backbone=backbone, in_chans=3, out_chans=3)
        sd = _randomize(net, seed=4)
        g = torch.Generator().manual_seed(5)
        x = torch.randn(1, 3, 16, 32, generator=g)
        with torch.no_grad():
            ref_out = net(x).numpy()
        # the PrecipNet prefixes backbone keys with "backbone."
        backbone_sd = {
            k[len("backbone."):]: v.numpy()
            for k, v in sd.items() if k.startswith("backbone.")
        }
        head_sd = {
            k.replace("ppad.", "").replace("conv.", "conv."): v.numpy()
            for k, v in sd.items() if not k.startswith("backbone.")
        }
        res_b = convert_afno_state_dict(
            backbone_sd, img_size=KW["img_size"], patch_size=KW["patch_size"]
        )
        res_h = convert_afno_state_dict(
            head_sd, img_size=KW["img_size"], patch_size=KW["patch_size"]
        )
        assert res_b["unconverted"] == [] and res_h["unconverted"] == []
        my = MyPrecip(backbone=MyAFNO(**KW))
        params = {"backbone": res_b["params"], **res_h["params"]}

        # one-shot conversion of the RAW PrecipNet state_dict ("backbone."
        # prefixes intact) must produce the same nested tree
        res_full = convert_afno_state_dict(
            {k: v.numpy() for k, v in sd.items()},
            img_size=KW["img_size"], patch_size=KW["patch_size"],
        )
        assert res_full["unconverted"] == []
        flat_a = jax.tree_util.tree_leaves(res_full["params"])
        flat_b = jax.tree_util.tree_leaves(params)
        assert jax.tree_util.tree_structure(
            res_full["params"]
        ) == jax.tree_util.tree_structure(params)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        out = np.asarray(
            my.apply(
                {"params": params},
                jnp.asarray(np.moveaxis(x.numpy(), 1, -1)),
            )
        )
        rel = np.linalg.norm(ref_out - np.moveaxis(out, -1, 1)) / max(
            np.linalg.norm(ref_out), 1e-12
        )
        assert rel < 1e-4, rel

    def test_fcn_wrapper_torch_ingestion(self, tmp_path):
        """FCNWrapper.load_model reads a torch FourCastNet checkpoint through
        the torch-free reader + AFNO converter."""
        from msfno_tpu.models.registry import get_model
        from msfno_tpu.models.registry_fcn import fcn_config
        from msfno_tpu.utils.config import SFNOConfig

        afnonet = import_reference_afnonet()
        net = afnonet.AFNONet(
            img_size=(16, 32), patch_size=(4, 4), in_chans=20, out_chans=20,
            embed_dim=16, depth=1,  # num_blocks=8, the wrapper's default
        )
        sd = _randomize(net, seed=6)
        path = str(tmp_path / "fcn.ckpt")
        torch.save({"model_state": sd}, path)

        import dataclasses

        cfg = dataclasses.replace(
            fcn_config(20), img_size=(16, 32), scale_factor=4,
            embed_dim=16, num_layers=1,
        )
        w = get_model("fcn", "0", cfg=cfg)
        params = w.load_model(path)
        g = torch.Generator().manual_seed(7)
        x = torch.randn(1, 20, 16, 32, generator=g)
        net.eval()
        with torch.no_grad():
            ref_out = net(x).numpy()
        out = np.asarray(
            w.module.apply(
                {"params": params},
                jnp.asarray(np.moveaxis(x.numpy(), 1, -1)),
            )
        )
        rel = np.linalg.norm(ref_out - np.moveaxis(out, -1, 1)) / (
            np.linalg.norm(ref_out)
        )
        assert rel < 1e-4, rel
