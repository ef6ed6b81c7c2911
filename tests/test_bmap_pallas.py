"""Interpret-mode parity of the Pallas backward-map kernel vs the XLA path.

The XLA backward_map (render/stabilize.py) is the oracle — it is itself
golden-tested end-to-end against the reference's stabilized videos.  The
kernel must reproduce its maps, coverage, and crop edges on meshes both
sparser and denser than the lane width, including uncovered pixels.
"""

import numpy as np
import pytest

import meshflow_tpu  # noqa: F401  (platform/precision pins)
import jax
import jax.numpy as jnp

from meshflow_tpu.config import MeshFlowConfig
from meshflow_tpu.kernels.bmap_pallas import backward_map_pallas
from meshflow_tpu.render.stabilize import backward_map, crop_edges
from meshflow_tpu.utils import grid


def _case(config, h, w, seed, scale):
    rng = np.random.default_rng(seed)
    unstab = np.asarray(grid.vertex_grid(config, h, w), np.float32)
    stab = unstab + rng.normal(0.0, scale, unstab.shape).astype(np.float32)
    return jnp.asarray(stab), jnp.asarray(unstab)


@pytest.mark.parametrize(
    "mesh,h,w,scale",
    [
        (16, 48, 64, 1.5),   # default mesh density, mild warp
        (4, 40, 56, 6.0),    # cells < lane width, strong warp (uncovered px)
        (16, 48, 64, 12.0),  # heavy warp: sentinel + membership edges
    ],
)
def test_bmap_kernel_matches_xla(mesh, h, w, scale):
    config = MeshFlowConfig(mesh_row_count=mesh, mesh_col_count=mesh)
    stab, unstab = _case(config, h, w, seed=mesh * 7 + int(scale), scale=scale)

    ref = backward_map(stab, unstab, config, h, w)
    out = backward_map_pallas(stab, unstab, config, h, w, interpret=True)

    ref_cov = np.asarray(ref.covered)
    out_cov = np.asarray(out.covered)
    # Coverage decisions share the exact same arithmetic; require equality.
    np.testing.assert_array_equal(out_cov, ref_cov)

    np.testing.assert_allclose(
        np.asarray(out.map_x), np.asarray(ref.map_x), rtol=0, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.map_y), np.asarray(ref.map_y), rtol=0, atol=1e-4
    )

    np.testing.assert_array_equal(
        np.asarray(crop_edges(out, h, w)), np.asarray(crop_edges(ref, h, w))
    )


def test_bmap_router_stays_on_xla_for_cpu_and_small_frames():
    from meshflow_tpu.render.stabilize import use_bmap_pallas

    config = MeshFlowConfig()
    assert not use_bmap_pallas(360, 640, config)  # parity-contract size
