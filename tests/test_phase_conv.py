"""Exactness of the phase-space conv rewrites (ops/phase_conv.py) against the
plain reflect_pad + conv + nearest-upsample formulation used by the reference
Ghiasi layers (ghiasi.py:6-62)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speedplusbaseline_tpu.models.ghiasi import reflect_pad, upsample_nearest
from speedplusbaseline_tpu.ops.instancenorm import instance_norm_film
from speedplusbaseline_tpu.ops.phase_conv import (
    conv3x3_s2_phase,
    conv3x3_s2_phase_aligned,
    conv9x9_phase,
    depth_to_space2,
    phase_instance_norm,
    phase_instance_norm_packed,
    space_to_depth2,
    upconv3x3_phase_packed,
)


def conv_ref(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


@pytest.fixture()
def prec():
    with jax.default_matmul_precision("float32"):
        yield


class TestS2DRoundtrip:
    def test_inverse(self, rng):
        x = jnp.asarray(rng.rand(2, 8, 12, 5).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(depth_to_space2(space_to_depth2(x))), np.asarray(x))


class TestConv3x3Stride2(object):
    def test_matches_reflect_pad_conv(self, rng, prec):
        x = rng.rand(2, 16, 24, 6).astype(np.float32)
        w = (rng.randn(3, 3, 6, 7) * 0.3).astype(np.float32)
        b = rng.randn(7).astype(np.float32)

        ref = conv_ref(reflect_pad(jnp.asarray(x), 1), w, stride=2) + b
        ours = conv3x3_s2_phase(space_to_depth2(jnp.asarray(x)),
                                jnp.asarray(w), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_aligned_form_matches(self, rng, prec):
        x = rng.rand(2, 16, 24, 6).astype(np.float32)
        w = (rng.randn(3, 3, 6, 7) * 0.3).astype(np.float32)
        b = rng.randn(7).astype(np.float32)

        ref = conv_ref(reflect_pad(jnp.asarray(x), 1), w, stride=2) + b
        ours = conv3x3_s2_phase_aligned(space_to_depth2(jnp.asarray(x)),
                                        jnp.asarray(w), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestUpConv3x3Packed:
    def test_matches_upsample_reflect_pad_conv(self, rng, prec):
        x = rng.rand(2, 9, 13, 6).astype(np.float32)
        w = (rng.randn(3, 3, 6, 5) * 0.3).astype(np.float32)
        b = rng.randn(5).astype(np.float32)

        up = upsample_nearest(jnp.asarray(x), 2)
        ref = conv_ref(reflect_pad(up, 1), w) + b

        z = upconv3x3_phase_packed(jnp.asarray(x), jnp.asarray(w),
                                   jnp.asarray(b))
        ours = depth_to_space2(z)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestConv9x9:
    def test_matches_reflect_pad_conv(self, rng, prec):
        x = rng.rand(2, 18, 22, 3).astype(np.float32)
        w = (rng.randn(9, 9, 3, 4) * 0.2).astype(np.float32)
        b = rng.randn(4).astype(np.float32)

        ref = conv_ref(reflect_pad(jnp.asarray(x), 4), w) + b
        y4 = conv9x9_phase(space_to_depth2(jnp.asarray(x)),
                           jnp.asarray(w), jnp.asarray(b))
        ours = depth_to_space2(y4)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-5, atol=2e-5)

    def test_double_packed_matches(self, rng, prec):
        """conv9x9_phase_dp (stride-2 double-packed output, the Ghiasi l10
        lowering) must equal the stride-1 phase conv after two d2s."""
        from speedplusbaseline_tpu.ops.phase_conv import (
            conv9x9_phase_dp,
            phase_instance_norm_packed,
        )

        x = rng.rand(2, 20, 24, 3).astype(np.float32)
        w = (rng.randn(9, 9, 3, 3) * 0.2).astype(np.float32)
        b = rng.randn(3).astype(np.float32)

        ref = conv_ref(reflect_pad(jnp.asarray(x), 4), w) + b
        ydp = conv9x9_phase_dp(space_to_depth2(jnp.asarray(x)),
                               jnp.asarray(w), jnp.asarray(b))
        assert ydp.shape == (2, 5, 6, 48)
        ours = depth_to_space2(depth_to_space2(ydp))
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-5, atol=2e-5)

        # 16-phase IN == full-res IN
        gamma = rng.rand(2, 3).astype(np.float32) + 0.5
        beta = rng.randn(2, 3).astype(np.float32)
        ref_in = instance_norm_film(ours, jnp.asarray(gamma),
                                    jnp.asarray(beta))
        our_in = depth_to_space2(depth_to_space2(phase_instance_norm_packed(
            ydp, jnp.asarray(gamma), jnp.asarray(beta), phases=16)))
        np.testing.assert_allclose(np.asarray(our_in), np.asarray(ref_in),
                                   rtol=1e-4, atol=1e-5)

class TestPhaseInstanceNorm:
    def test_packed_matches_full_res(self, rng, prec):
        y = rng.rand(2, 8, 10, 12).astype(np.float32)  # (B,h,w,4C), C=3
        gamma = rng.rand(2, 3).astype(np.float32) + 0.5
        beta = rng.randn(2, 3).astype(np.float32)

        full = depth_to_space2(jnp.asarray(y))
        ref = instance_norm_film(full, jnp.asarray(gamma), jnp.asarray(beta))

        ours4 = phase_instance_norm(jnp.asarray(y), jnp.asarray(gamma),
                                    jnp.asarray(beta))
        ours = depth_to_space2(ours4)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_packed_stats_form(self, rng, prec):
        y = rng.rand(2, 8, 10, 12).astype(np.float32)
        gamma = rng.rand(2, 3).astype(np.float32) + 0.5
        beta = rng.randn(2, 3).astype(np.float32)

        a = phase_instance_norm(jnp.asarray(y), jnp.asarray(gamma),
                                jnp.asarray(beta))
        b = phase_instance_norm_packed(jnp.asarray(y), jnp.asarray(gamma),
                                       jnp.asarray(beta))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)

    def test_phase_axis_form(self, rng, prec):
        z = rng.rand(2, 8, 10, 4, 5).astype(np.float32)
        packed = phase_instance_norm(
            jnp.asarray(z.reshape(2, 8, 10, 20)))
        axised = phase_instance_norm(jnp.asarray(z), phase_axis=3)
        np.testing.assert_allclose(np.asarray(axised).reshape(2, 8, 10, 20),
                                   np.asarray(packed), rtol=1e-6, atol=1e-6)
