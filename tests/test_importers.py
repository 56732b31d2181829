"""Importer validation with synthetic fixtures (VERDICT item 6):

(a) ultralytics YOLOv8 .pt conversion — a real torch module tree in the
    ultralytics layout (model.0.conv / .bn, c2f m-chains, detect heads) is
    built in-test with the exact yolov8n channel plan, saved with
    torch.save, and run through convert(): BN folding must match the torch
    conv+BN eval output, the tree must match init_params' structure, and
    forward() must run on the result (reference deploys pretrained
    ultralytics, /root/reference/README.md:87-104).

(b) ORBvoc.txt parsing — a tiny DBoW2-text-format vocabulary fixture
    covering unbalanced trees (shallow leaves), matching the surface the
    reference's own test exercises (test_dbow2_integration.cpp:63-126).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from dynamic_visual_slam_tpu.models import yolov8  # noqa: E402


# ---------------------------------------------------------------------------
# (a) ultralytics converter
# ---------------------------------------------------------------------------

def _build_fake_ultralytics(params_ref):
    """torch module tree with ultralytics names and shapes derived from our
    init_params reference tree (w is HWIO: (kh, kw, I, O))."""
    import torch
    import torch.nn as nn

    g = torch.Generator().manual_seed(0)

    def conv_bn(leaf):
        kh, kw, cin, cout = leaf["w"].shape
        m = nn.Module()
        m.conv = nn.Conv2d(cin, cout, (kh, kw), bias=False)
        m.bn = nn.BatchNorm2d(cout, eps=1e-3)
        with torch.no_grad():
            m.conv.weight.copy_(torch.randn(m.conv.weight.shape,
                                            generator=g) * 0.2)
            m.bn.weight.copy_(torch.rand(cout, generator=g) + 0.5)
            m.bn.bias.copy_(torch.randn(cout, generator=g) * 0.1)
            m.bn.running_mean.copy_(torch.randn(cout, generator=g) * 0.1)
            m.bn.running_var.copy_(torch.rand(cout, generator=g) + 0.5)
        return m

    def plain_conv(leaf):
        kh, kw, cin, cout = leaf["w"].shape
        c = nn.Conv2d(cin, cout, (kh, kw), bias=True)
        with torch.no_grad():
            c.weight.copy_(torch.randn(c.weight.shape, generator=g) * 0.2)
            c.bias.copy_(torch.randn(cout, generator=g) * 0.1)
        return c

    def c2f(node):
        m = nn.Module()
        m.cv1 = conv_bn(node["cv1"])
        m.cv2 = conv_bn(node["cv2"])
        m.m = nn.Sequential(*[_bottleneck(b) for b in node["m"]])
        return m

    def _bottleneck(b):
        m = nn.Module()
        m.cv1 = conv_bn(b["cv1"])
        m.cv2 = conv_bn(b["cv2"])
        return m

    def sppf(node):
        m = nn.Module()
        m.cv1 = conv_bn(node["cv1"])
        m.cv2 = conv_bn(node["cv2"])
        return m

    from dynamic_visual_slam_tpu.models.convert_ultralytics import _BACKBONE
    modules = {}
    for idx, name in _BACKBONE:
        node = params_ref[name]
        if name.startswith(("c2f", "up_c2f", "down_c2f")):
            modules[idx] = c2f(node)
        elif name == "sppf":
            modules[idx] = sppf(node)
        else:
            modules[idx] = conv_bn(node)

    det = nn.Module()
    det.cv2 = nn.ModuleList()
    det.cv3 = nn.ModuleList()
    for head in params_ref["heads"]:
        det.cv2.append(nn.Sequential(conv_bn(head["box1"]),
                                     conv_bn(head["box2"]),
                                     plain_conv(head["box3"])))
        det.cv3.append(nn.Sequential(conv_bn(head["cls1"]),
                                     conv_bn(head["cls2"]),
                                     plain_conv(head["cls3"])))
    modules["22"] = det

    root = nn.Module()
    inner = nn.Module()
    for idx, mod in modules.items():
        inner.add_module(idx, mod)
    root.add_module("model", inner)
    return root


class TestUltralyticsConverter:
    def test_convert_structure_folding_forward(self, tmp_path):
        torch = pytest.importorskip("torch")
        from dynamic_visual_slam_tpu.models import convert_ultralytics as cu

        params_ref = yolov8.init_params(jax.random.key(0))
        fake = _build_fake_ultralytics(params_ref)
        pt = tmp_path / "fake_yolov8n.pt"
        torch.save({"model": fake}, pt)

        params = cu.convert(str(pt))

        # 1. tree structure + shapes match the runtime layout exactly
        ref_leaves, ref_tree = jax.tree_util.tree_flatten(
            jax.tree_util.tree_map(lambda x: getattr(x, "shape", x),
                                   params_ref))
        got_leaves, got_tree = jax.tree_util.tree_flatten(
            jax.tree_util.tree_map(lambda x: getattr(x, "shape", x), params))
        assert ref_tree == got_tree
        for r, gt in zip(ref_leaves, got_leaves):
            assert r == gt, (r, gt)

        # 2. BN folding is numerically exact: folded conv output ==
        #    torch conv+bn eval output (bf16 storage => ~1% tolerance)
        m0 = getattr(fake.model, "0").eval()
        x = torch.randn(1, m0.conv.in_channels, 16, 16,
                        generator=torch.Generator().manual_seed(1))
        with torch.no_grad():
            y_ref = m0.bn(m0.conv(x)).numpy()
        w = np.asarray(params["stem"]["w"], np.float32)   # (kh,kw,I,O)
        b = np.asarray(params["stem"]["b"], np.float32)
        wt = torch.from_numpy(w.transpose(3, 2, 0, 1).copy())
        with torch.no_grad():
            y_fold = torch.nn.functional.conv2d(
                x, wt, torch.from_numpy(b)).numpy()
        np.testing.assert_allclose(y_fold, y_ref, rtol=2e-2, atol=2e-2)

        # 3. the converted tree drives the real forward pass
        img = jnp.zeros((1, 64, 64, 3), jnp.float32)
        for box_logits, cls_logits in yolov8.forward(params, img):
            assert np.isfinite(np.asarray(box_logits, np.float32)).all()
            assert np.isfinite(np.asarray(cls_logits, np.float32)).all()

        # 4. save/load roundtrip preserves every leaf
        npz = tmp_path / "params.npz"
        cu.save_params(params, str(npz))
        params2 = cu.load_params(str(npz))
        for a, b2 in zip(jax.tree_util.tree_leaves(params),
                         jax.tree_util.tree_leaves(params2)):
            if hasattr(a, "shape"):
                np.testing.assert_array_equal(np.asarray(a, np.float32),
                                              np.asarray(b2, np.float32))


# ---------------------------------------------------------------------------
# (b) ORBvoc.txt loader
# ---------------------------------------------------------------------------

def _write_orbvoc(path, k=2, depth=3):
    """Tiny DBoW2-format vocabulary: k=2, L=3, one shallow leaf.

    Node lines: parent_id is_leaf 32_byte_values weight (ids implicit by
    file order, root = 0). Node 2 is a leaf at level 0 (unbalanced tree).
    """
    def d(byte):
        return np.full(32, byte, np.uint8)

    lines = [f"{k} {depth} 0 0"]
    nodes = [
        # (parent, is_leaf, bytes, weight)
        (0, 0, d(0x00), 0.0),     # id 1: level0 slot0
        (0, 1, d(0xFF), 0.7),     # id 2: level0 slot1 -- SHALLOW LEAF
        (1, 0, d(0x0F), 0.0),     # id 3: level1 slot0
        (1, 0, d(0xF0), 0.0),     # id 4: level1 slot1
        (3, 1, d(0x0F), 0.5),     # id 5: level2 slot0 (word)
        (3, 1, d(0x1F), 0.4),     # id 6: level2 slot1 (word)
        (4, 1, d(0xF0), 0.3),     # id 7: level2 slot2 (word)
        (4, 1, d(0xF8), 0.2),     # id 8: level2 slot3 (word)
    ]
    for parent, leaf, bits, w in nodes:
        lines.append(f"{parent} {leaf} " +
                     " ".join(str(int(x)) for x in bits) + f" {w}")
    path.write_text("\n".join(lines) + "\n")
    return nodes


class TestOrbVocLoader:
    def test_load_structure_and_descend(self, tmp_path):
        from dynamic_visual_slam_tpu.place import bow
        voc_path = tmp_path / "ORBvoc_tiny.txt"
        _write_orbvoc(voc_path)
        voc = bow.load_orbvoc_text(str(voc_path))
        assert voc.k == 2 and voc.depth == 3
        assert voc.n_words == 8

        # descriptor equal to word 5's pattern must land on word slot 0
        def bits_of(byte):
            return jnp.asarray(np.unpackbits(
                np.full(32, byte, np.uint8)[:, None], axis=1,
                bitorder="little").reshape(-1))

        w = bow.descend(voc, bits_of(0x0F)[None])
        assert int(w[0]) == 0
        # 0xE0: closer to the 0x00 branch at level 0, then 0xF0 at level 1,
        # then word slot 2 (0xF0) at the bottom
        w = bow.descend(voc, bits_of(0xE0)[None])
        assert int(w[0]) == 2

        # the shallow leaf (level0 slot1, 0xFF) was propagated down a
        # single-child chain: slot 1*2*2 = 4 at the bottom, weight 0.7
        w = bow.descend(voc, bits_of(0xFF)[None])
        assert int(w[0]) == 4
        assert float(voc.word_weights[4]) == pytest.approx(0.7)

        # word weights land in the right slots
        assert float(voc.word_weights[0]) == pytest.approx(0.5)
        assert float(voc.word_weights[3]) == pytest.approx(0.2)

    def test_query_on_loaded_vocab(self, tmp_path):
        """Database add/query on a text-loaded vocabulary — the reference
        test's query-self-expect-own-entry case
        (test_dbow2_integration.cpp:103-125)."""
        from dynamic_visual_slam_tpu.place import bow
        voc_path = tmp_path / "ORBvoc_tiny.txt"
        _write_orbvoc(voc_path)
        voc = bow.load_orbvoc_text(str(voc_path))
        db = bow.Database(voc, capacity=8)

        def bits_of(bytes_list):
            arr = np.stack([np.full(32, b, np.uint8) for b in bytes_list])
            return jnp.asarray(np.unpackbits(arr[:, :, None], axis=2,
                                             bitorder="little"
                                             ).reshape(len(bytes_list), 256))

        a = bits_of([0x0F, 0x1F, 0x0F])
        b = bits_of([0xF0, 0xF8, 0xFF])
        ia = db.add(a)
        ib = db.add(b)
        res = db.query(a, top_k=2)
        assert bool(res.valid[0])
        assert int(res.entry_ids[0]) == ia
        assert float(res.scores[0]) > float(res.scores[1]) - 1e-6
