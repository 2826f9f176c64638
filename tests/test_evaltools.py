"""Eval tools: Fréchet math vs scipy, streaming stats vs numpy, Inception
golden vs torchvision (converted random weights), ROI crop, QS normalization,
region CLIP score mechanics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbe_tpu.evaltools.fid import (
    RunningStats,
    frechet_distance,
    sqrtm_product_eigh,
)


def _random_cov(d, seed):
    g = np.random.default_rng(seed)
    a = g.standard_normal((d, d))
    return a @ a.T / d + np.eye(d) * 0.1


def test_sqrtm_trace_matches_scipy():
    from scipy import linalg

    a, b = _random_cov(16, 0), _random_cov(16, 1)
    want = np.trace(linalg.sqrtm(a @ b).real)
    got = sqrtm_product_eigh(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_frechet_distance_matches_reference_formula():
    from scipy import linalg

    g = np.random.default_rng(0)
    mu1, mu2 = g.standard_normal(8), g.standard_normal(8)
    s1, s2 = _random_cov(8, 2), _random_cov(8, 3)
    covmean = linalg.sqrtm(s1 @ s2).real
    want = (mu1 - mu2) @ (mu1 - mu2) + np.trace(s1 + s2 - 2 * covmean)
    got = frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # identical distributions -> 0
    assert abs(frechet_distance(mu1, s1, mu1, s1)) < 1e-6


def test_running_stats_matches_numpy():
    g = np.random.default_rng(0)
    x = g.standard_normal((100, 7))
    rs = RunningStats()
    for i in range(0, 100, 13):
        rs.update(x[i:i + 13])
    mu, cov = rs.finalize()
    np.testing.assert_allclose(mu, x.mean(axis=0), atol=1e-12)
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False), atol=1e-12)


def test_basic_conv2d_matches_torch(np_rng):
    """BasicConv2d (conv + BN eps1e-3 + relu) vs torch, converted weights."""
    import torch
    import torch.nn.functional as F

    from pbe_tpu.evaltools.inception import BasicConv2d

    x = np_rng.standard_normal((2, 11, 11, 5)).astype(np.float32)
    mod = BasicConv2d(8, (3, 3), stride=2, padding=(0, 0))
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree.map(
        lambda p: jnp.asarray(np_rng.standard_normal(p.shape) * 0.1 + (
            1.0 if p.ndim == 1 else 0.0), jnp.float32), params)
    # make variance positive
    p = params["params"]
    p["bn_var"] = jnp.abs(p["bn_var"]) + 0.5
    got = np.asarray(mod.apply(params, jnp.asarray(x)))

    w = np.transpose(np.asarray(p["conv"]["kernel"]), (3, 2, 0, 1))
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    h = F.conv2d(t, torch.from_numpy(w), stride=2)
    h = F.batch_norm(
        h, torch.from_numpy(np.asarray(p["bn_mean"])),
        torch.from_numpy(np.asarray(p["bn_var"])),
        torch.from_numpy(np.asarray(p["bn_scale"])),
        torch.from_numpy(np.asarray(p["bn_bias"])), eps=1e-3,
    )
    want = np.transpose(F.relu(h).numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_avg_pool_padding_semantics(np_rng):
    """count_include_pad True/False vs torch F.avg_pool2d."""
    import torch
    import torch.nn.functional as F

    from pbe_tpu.evaltools.inception import (
        _avg_pool_3x3_incpad, _avg_pool_3x3_same_nopad,
    )

    x = np_rng.standard_normal((1, 7, 7, 3)).astype(np.float32)
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    for fn, flag in ((_avg_pool_3x3_same_nopad, False), (_avg_pool_3x3_incpad, True)):
        got = np.asarray(fn(jnp.asarray(x)))
        want = np.transpose(
            F.avg_pool2d(t, 3, stride=1, padding=1, count_include_pad=flag).numpy(),
            (0, 2, 3, 1),
        )
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=str(flag))


def test_inception_forward_shapes_and_converter():
    """Structural test: full forward produces 2048-d features, and a
    torchvision-shaped synthetic state_dict converts onto the exact tree."""
    from pbe_tpu.evaltools.inception import (
        InceptionV3Features, convert_inception_state_dict,
    )

    model = InceptionV3Features()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    out = model.apply(variables, jnp.zeros((2, 299, 299, 3)))
    assert out.shape == (2, 2048)

    # synthesize torchvision-style keys from our own tree (inverse map)
    import flax.traverse_util as traverse

    flat = traverse.flatten_dict(variables["params"])
    sd = {}
    inv = {"bn_scale": ("bn", "weight"), "bn_bias": ("bn", "bias"),
           "bn_mean": ("bn", "running_mean"), "bn_var": ("bn", "running_var")}
    for path, v in flat.items():
        v = np.asarray(v)
        if path[-1] == "kernel":
            key = ".".join(path[:-2] + ("conv", "weight"))
            sd[key] = np.transpose(v, (3, 2, 0, 1))
        else:
            mod, leaf = inv[path[-1]]
            key = ".".join(path[:-1] + (mod, leaf))
            sd[key] = v
    sd["fc.weight"] = np.zeros((1000, 2048))  # dropped
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1))  # dropped
    sd["Conv2d_1a_3x3.bn.num_batches_tracked"] = np.zeros(())  # dropped
    converted = convert_inception_state_dict(sd)
    got_flat = traverse.flatten_dict(converted["params"])
    assert set(got_flat.keys()) == set(flat.keys())
    for k in flat:
        np.testing.assert_array_equal(np.asarray(got_flat[k]), np.asarray(flat[k]))


@pytest.mark.skip(reason="torchvision not available in this image")
def test_inception_matches_torchvision(np_rng):
    """Golden test: flax InceptionV3 pool3 features == torchvision Inception3
    (random weights, converted) within fp32 tolerance. Enable when
    torchvision is installed."""
    import torch
    import torchvision.models as tvm

    from pbe_tpu.evaltools.inception import (
        InceptionV3Features, convert_inception_state_dict,
    )

    torch.manual_seed(0)
    tv = tvm.inception_v3(weights=None, aux_logits=True, init_weights=True).eval()
    sd = {k: v.numpy() for k, v in tv.state_dict().items()}
    variables = convert_inception_state_dict(sd)
    # torchvision default pooling (count_include_pad=True), no input rescale
    model = InceptionV3Features(fid_pools=False, normalize_input=False)

    x = np_rng.uniform(0, 1, (1, 299, 299, 3)).astype(np.float32)
    got = np.asarray(model.apply(variables, jnp.asarray(x)))

    with torch.no_grad():
        t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        # torchvision forward up to pool3 (skip its transform_input + fc)
        m = tv
        h = t
        for name in ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3"]:
            h = getattr(m, name)(h)
        h = m.maxpool1(h)
        h = m.Conv2d_3b_1x1(h)
        h = m.Conv2d_4a_3x3(h)
        h = m.maxpool2(h)
        for name in ["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                     "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                     "Mixed_7c"]:
            h = getattr(m, name)(h)
        want = h.mean(dim=(2, 3)).numpy()
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)


def test_bboxes_from_masks_and_crop():
    from pbe_tpu.evaltools.fid_callback import bboxes_from_masks, crop_and_resize

    m = np.zeros((2, 32, 32, 1), np.float32)
    m[0, 8:16, 4:20] = 1.0  # box
    # m[1] empty -> full image
    boxes = np.asarray(bboxes_from_masks(jnp.asarray(m)))
    np.testing.assert_array_equal(boxes[0], [8, 4, 16, 20])
    np.testing.assert_array_equal(boxes[1], [0, 0, 32, 32])

    img = np.zeros((2, 32, 32, 3), np.float32)
    img[0, 8:16, 4:20] = 1.0
    out = np.asarray(crop_and_resize(jnp.asarray(img), jnp.asarray(boxes), size=16))
    assert out.shape == (2, 16, 16, 3)
    # crop of the constant-1 region stays ~1 in the interior
    assert out[0, 4:12, 4:12].min() > 0.9
    assert abs(out[1].mean()) < 1e-5


def test_qs_normalization():
    from pbe_tpu.evaltools.gmm_score import qs_from_loglik

    # reference: clip((x-0)/300, 0, 1).mean()*100 (gmm_score_coco.py:101-108)
    assert qs_from_loglik(np.asarray([300.0, 300.0])) == 100.0
    assert qs_from_loglik(np.asarray([-50.0])) == 0.0
    np.testing.assert_allclose(qs_from_loglik(np.asarray([150.0])), 50.0)


def test_gmm_score_end_to_end():
    from pbe_tpu.evaltools.gmm_score import fit_gmm, gmm_score

    g = np.random.default_rng(0)
    feats = g.standard_normal((200, 4))
    gmm = fit_gmm(feats, n_components=2)

    def feature_fn(images):
        return images.reshape(images.shape[0], -1)[:, :4]

    imgs = [g.standard_normal((2, 2, 1)).astype(np.float32) for _ in range(10)]
    s = gmm_score(feature_fn, imgs, gmm)
    assert 0.0 <= s <= 100.0


def test_region_clip_score_mechanics(np_rng):
    from pbe_tpu.evaltools.clip_score import (
        CLIPImageEmbedder, crop_to_mask_bbox, region_clip_score,
    )
    from pbe_tpu.models.clip_vit import CLIPVisionConfig

    tiny = CLIPVisionConfig(hidden_size=32, num_layers=1, num_heads=2,
                            mlp_dim=64, patch_size=32, image_size=224)
    emb = CLIPImageEmbedder(tiny)
    img = np_rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    mask = np.zeros((64, 64, 1), np.float32)
    mask[16:48, 16:48] = 1.0
    crop = crop_to_mask_bbox(img, mask)
    assert crop.shape == (224, 224, 3)
    # identical result/ref -> same crop vs itself gives 100
    score = region_clip_score(emb, [img], [crop], [mask])
    # embedding of crop vs embedding of (resized) ref==crop: identical
    assert 99.0 < score <= 100.0001

    ref2 = np_rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    score2 = region_clip_score(emb, [img], [ref2], [mask])
    assert score2 <= 100.0001
