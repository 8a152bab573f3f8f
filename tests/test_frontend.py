import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from mageslam_tpu.config import FeatureExtractorSettings
from mageslam_tpu.geometry import camera
from mageslam_tpu.ops import anms as anms_mod
from mageslam_tpu.ops import fast as fast_mod
from mageslam_tpu.ops import image as image_mod
from mageslam_tpu.ops import orb as orb_mod
from mageslam_tpu.ops.frontend import detect_and_compute


def checker_image(rng, h=120, w=160):
    """Random blobby test image with corners."""
    img = (rng.rand(h // 8, w // 8) * 255).astype(np.float32)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_NEAREST)
    img = cv2.GaussianBlur(img, (3, 3), 0.8)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_gaussian_blur_matches_cv2(rng):
    img = checker_image(rng).astype(np.float32)
    ours = np.asarray(image_mod.gaussian_blur(jnp.asarray(img), 7, 2.0))
    ref = cv2.GaussianBlur(img, (7, 7), 2, borderType=cv2.BORDER_REFLECT_101)
    np.testing.assert_allclose(ours, ref, atol=1e-2)


def test_fast_matches_cv2(rng):
    img = checker_image(rng)
    thr = 20
    score = np.asarray(fast_mod.nms3x3(fast_mod.fast_score_map(jnp.asarray(img, jnp.float32), thr)))
    det = cv2.FastFeatureDetector_create(thr, True, cv2.FAST_FEATURE_DETECTOR_TYPE_9_16)
    kps = det.detect(img)
    ref = {(int(k.pt[0]), int(k.pt[1])): k.response for k in kps}
    ours = {
        (x, y): score[y, x]
        for y, x in zip(*np.nonzero(score > 0))
    }
    # cv2 FAST detects in the interior only; compare on common support
    common = set(ref) & set(ours)
    assert len(common) >= 0.9 * max(len(ref), 1), (len(common), len(ref), len(ours))
    for pt in common:
        assert abs(ref[pt] - ours[pt]) <= 1.0, (pt, ref[pt], ours[pt])
    # no spurious detections far beyond cv2's set
    assert len(ours) <= len(ref) + 0.1 * len(ref) + 5


def test_fast_threshold_semantics():
    # synthetic corner: bright disk on dark background
    img = np.zeros((32, 32), np.float32)
    img[10:20, 10:20] = 100.0
    score = np.asarray(fast_mod.fast_score_map(jnp.asarray(img), 10))
    assert (score > 0).any()
    # flat image: no corners
    flat = np.full((32, 32), 50.0, np.float32)
    assert not (np.asarray(fast_mod.fast_score_map(jnp.asarray(flat), 10)) > 0).any()


def test_anms_selects_spatially_distributed(rng):
    # two clusters of strong corners + spread of weak corners: ANMS should not
    # take everything from the strong cluster
    k = 256
    xy = np.zeros((k, 2), np.float32)
    resp = np.zeros((k,), np.float32)
    xy[:64] = rng.uniform(0, 10, (64, 2))          # dense strong cluster
    resp[:64] = rng.uniform(100.0, 250.0, 64)      # spread strengths → intra-cluster suppression
    xy[64:128] = rng.uniform(0, 320, (64, 2))      # spread, weaker
    resp[64:128] = 50.0 + rng.rand(64)
    valid = np.zeros((k,), bool)
    valid[:128] = True
    keep = np.asarray(
        anms_mod.adaptive_nms(
            jnp.asarray(np.floor(xy)), jnp.asarray(resp), jnp.asarray(valid),
            num_to_keep=32, fast_threshold=4, strong_response=20,
            min_robustness=1.1, max_robustness=2.0,
        )
    )
    assert keep.sum() == 32
    assert keep[64:128].sum() >= 10  # spread corners survive


def test_spatial_select_round_robins_cells(rng):
    # a dominant high-contrast cluster holding more candidates than the whole
    # budget, plus weak corners spread over the rest of the image: the default
    # RetainBestFeatures response cut hands the cluster the entire budget;
    # spatial_select must give every populated cell a share
    k = 1024
    xy = np.zeros((k, 2), np.float32)
    resp = np.zeros((k,), np.float32)
    xy[:512, 0] = rng.uniform(280, 318, 512)       # right sliver (one cell col)
    xy[:512, 1] = rng.uniform(2, 178, 512)
    resp[:512] = rng.uniform(60.0, 250.0, 512)     # strong
    xy[512:900, 0] = rng.uniform(2, 278, 388)      # spread over the rest
    xy[512:900, 1] = rng.uniform(2, 178, 388)
    resp[512:900] = rng.uniform(5.0, 12.0, 388)    # weak
    valid = np.zeros((k,), bool)
    valid[:900] = True
    keep = np.asarray(anms_mod.spatial_select(
        jnp.asarray(xy), jnp.asarray(resp), jnp.asarray(valid),
        num_to_keep=440, image_width=320, image_height=180,
        grid_w=8, grid_h=6,
    ))
    assert keep.sum() == 440
    # the weak-but-spread corners hold their cells' share of the budget
    assert keep[512:900].sum() >= 300
    # within a cell, stronger candidates win before weaker ones
    gx = np.clip((xy[:, 0] * 8 / 320).astype(int), 0, 7)
    gy = np.clip((xy[:, 1] * 6 / 180).astype(int), 0, 5)
    cell = gx + gy * 8
    for c in np.unique(cell[keep]):
        in_cell = valid & (cell == c)
        kept_r = resp[keep & in_cell]
        dropped_r = resp[in_cell & ~keep]
        if len(kept_r) and len(dropped_r):
            assert kept_r.min() >= dropped_r.max()
    # degenerate case: fewer candidates than budget keeps everything
    keep2 = np.asarray(anms_mod.spatial_select(
        jnp.asarray(xy[:100]), jnp.asarray(resp[:100]),
        jnp.asarray(valid[:100]), num_to_keep=440,
        image_width=320, image_height=180))
    assert keep2.sum() == 100


def test_retain_best_features_bins():
    resp = jnp.asarray(np.array([250, 250, 100, 90, 10, 5, 3, 0], np.float32))
    valid = jnp.asarray(np.array([1, 1, 1, 1, 1, 1, 1, 0], bool))
    keep = np.asarray(
        anms_mod.retain_best_features(resp, valid, min_num=2, max_num=4,
                                      min_threshold=4, response_factor=0.9)
    )
    # minNumThreshold = 250 (bin of 2nd), cut = max(int(250*0.9), 4) = 225
    assert list(keep) == [True, True, False, False, False, False, False, False]


def test_descriptor_bit_planes_vs_direct(rng):
    img = checker_image(rng).astype(np.float32)
    blurred = image_mod.gaussian_blur(jnp.asarray(img), 7, 2.0)
    planes = orb_mod.descriptor_bit_planes(blurred, 15)
    xy = jnp.asarray(np.array([[40.0, 30.0], [80.0, 60.0], [20.0, 90.0]], np.float32))
    desc = np.asarray(orb_mod.gather_descriptors(planes, xy))
    # direct computation from pattern
    pat = orb_mod.brief_pattern(15)
    b = np.asarray(blurred)
    pad = int(np.abs(pat).max()) + 1
    bp = np.pad(b, pad)
    for n, (x, y) in enumerate(np.asarray(xy).astype(int)):
        for w in range(8):
            word = 0
            for bit in range(32):
                (x1, y1), (x2, y2) = pat[w * 32 + bit]
                v1 = bp[pad + y + y1, pad + x + x1]
                v2 = bp[pad + y + y2, pad + x + x2]
                word |= int(v1 < v2) << bit
            assert word == int(desc[n, w]), (n, w)


def test_detect_and_compute_shapes(rng):
    img = checker_image(rng, 180, 320).astype(np.float32)
    cam = camera.make_pinhole(300.0, 300.0, 160.0, 90.0, 320, 180)
    fes = FeatureExtractorSettings(NumFeatures=128, FastThreshold=10)
    ff = detect_and_compute(jnp.asarray(img), cam, fes, max_features=256)
    assert ff.xy.shape == (256, 2)
    assert ff.desc.shape == (256, 8)
    n = int(ff.count)
    assert 10 < n <= 128
    v = np.asarray(ff.valid)
    xy = np.asarray(ff.xy)[v]
    assert (xy[:, 0] >= 7).all() and (xy[:, 0] < 320 - 7).all()
    # pinhole camera: undistorted == distorted
    np.testing.assert_allclose(np.asarray(ff.und_xy)[v], xy, atol=1e-3)


def test_detect_and_compute_multilevel(rng):
    img = checker_image(rng, 180, 320).astype(np.float32)
    cam = camera.make_pinhole(300.0, 300.0, 160.0, 90.0, 320, 180)
    fes = FeatureExtractorSettings(NumFeatures=128, FastThreshold=10, NumLevels=3)
    ff = detect_and_compute(jnp.asarray(img), cam, fes, max_features=256)
    v = np.asarray(ff.valid)
    octaves = np.asarray(ff.octave)[v]
    assert octaves.max() >= 1  # features found beyond level 0
    # level-1 coords are scaled back to level-0 frame
    xy = np.asarray(ff.xy)[v]
    assert (xy[:, 0] < 320).all() and (xy[:, 1] < 180).all()


def test_spatial_selection_bootstrap_gating():
    # the round-robin EXTENSION applies to tracking frames only: an
    # uninitialized session must extract with the reference selection
    # (see config.SpatialFeatureSelection + pipeline._fes_boot)
    import dataclasses
    from mageslam_tpu.config import golden_path_settings
    from mageslam_tpu.runtime import SlamSession

    s = golden_path_settings()
    fes = dataclasses.replace(
        s.MonoSettings.MonoCamera.FeatureExtractorSettings,
        SpatialFeatureSelection=True)
    s = dataclasses.replace(s, MonoSettings=dataclasses.replace(
        s.MonoSettings, MonoCamera=dataclasses.replace(
            s.MonoSettings.MonoCamera, FeatureExtractorSettings=fes)))
    sess = SlamSession(s, image_width=320, image_height=180)
    assert sess.fes.SpatialFeatureSelection
    assert not sess._fes_boot.SpatialFeatureSelection
    # default-config sessions share the same object (no extra jit cache key)
    sess2 = SlamSession(golden_path_settings(),
                        image_width=320, image_height=180)
    assert sess2._fes_boot is sess2.fes
