"""ROI crop + resize ops."""

import jax.numpy as jnp
import numpy as np

from mgr_tpu.ops import image


def test_upper_body_box_margins_and_clipping():
    hip = jnp.asarray([[300.0, 350.0]])
    shc = jnp.asarray([[310.0, 100.0]])
    box = np.asarray(image.upper_body_box(hip, shc))[0]
    # up=shcY-120 (clipped to >=1), down=hipY+120, left=hipX-180,
    # right=hipX+180
    np.testing.assert_allclose(box, [1, 470, 120, 480], atol=0)
    # clipping snaps into [1, dim-1]
    box2 = np.asarray(
        image.upper_body_box(jnp.asarray([[630.0, 470.0]]),
                             jnp.asarray([[630.0, 20.0]]))
    )[0]
    assert box2[0] >= 1 and box2[1] <= 479
    assert box2[2] >= 1 and box2[3] <= 639


def test_crop_resize_identity_on_uniform():
    frame = jnp.full((480, 640), 7.0)
    box = jnp.asarray([100.0, 400.0, 100.0, 500.0])
    out = np.asarray(image.crop_resize_frame(frame, box, out_dim=60))
    assert out.shape == (60, 60)
    np.testing.assert_allclose(out, 7.0, atol=1e-3)


def test_crop_resize_reads_right_region():
    # Bright square inside the box dominates; outside is dark.
    frame = np.zeros((480, 640), np.float32)
    frame[200:280, 300:380] = 100.0
    box = jnp.asarray([200.0, 280.0, 300.0, 380.0])
    out = np.asarray(image.crop_resize_frame(jnp.asarray(frame), box, 60))
    assert out.mean() > 60.0  # mostly the bright region
    out_far = np.asarray(
        image.crop_resize_frame(
            jnp.asarray(frame), jnp.asarray([0.0, 60.0, 0.0, 60.0]), 60
        )
    )
    assert out_far.mean() < 1.0


def test_rgb_to_gray_weights():
    frame = np.zeros((2, 2, 3), np.float32)
    frame[..., 2] = 100.0  # R channel in BGR layout
    g = np.asarray(image.rgb_to_gray(jnp.asarray(frame)))
    np.testing.assert_allclose(g, 29.9, rtol=1e-5)


def test_extract_video_with_fallback():
    T = 3
    video = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, size=(T, 480, 640)
    ).astype(np.float32))
    hip = jnp.asarray(np.tile([[320.0, 300.0]], (T, 1)))
    shc = jnp.asarray(np.tile([[320.0, 150.0]], (T, 1)))
    valid = jnp.asarray([True, False, True])
    out = np.asarray(
        image.extract_upper_body_video(video, hip, shc, 60, valid)
    )
    assert out.shape == (T, 60, 60, 1)
    assert np.isfinite(out).all()
