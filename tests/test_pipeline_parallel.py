"""Explicit pipeline parallelism (parallel/pipeline.py): two disjoint
submeshes, coarse stage and SAM stage as separate overlapped programs with
per-stage parameter residency."""

import numpy as np

import jax
import jax.numpy as jnp

from protosam_tpu.models.alpnet import FewShotSeg
from protosam_tpu.models.io_protocol import ALPNetInput
from protosam_tpu.models.sam import build_sam
from protosam_tpu.parallel import PipelinedVolumeRunner
from protosam_tpu.pipeline import ProtoSAM, ProtoSAMConfig


def _tiny_pipe():
    rng = jax.random.PRNGKey(0)
    coarse = FewShotSeg(image_size=126, which_model="dinov2_t14")
    sam = build_sam("vit_t", image_size=256)
    supp = jax.random.normal(rng, (1, 3, 126, 126))
    fg = jnp.zeros((1, 126, 126)).at[:, 30:80, 30:80].set(1.0)
    cp = coarse.init(rng, supp, fg, 1 - fg, supp)["params"]
    sp = sam.init(rng, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 1, 2)),
                  jnp.ones((1, 1), jnp.int32), jnp.zeros((1, 4)))["params"]
    pipe = ProtoSAM(coarse, cp, sam, sp,
                    ProtoSAMConfig(image_size=(256, 256), use_cca=True,
                                   max_ccs=4))
    inp = ALPNetInput(supp, fg, supp)
    return pipe, inp


def test_pipelined_matches_forward_volume():
    """pp over 2+2 devices must reproduce the single-program volume path
    (identical per-microbatch programs, only the jit boundary moves)."""
    devs = jax.devices()
    assert len(devs) == 8
    pipe, inp = _tiny_pipe()
    queries = jax.random.normal(jax.random.PRNGKey(3), (8, 3, 126, 126))

    want_p, want_s = pipe.forward_volume(queries, inp, slice_batch=4)

    runner = PipelinedVolumeRunner(pipe, devs[:2], devs[2:4])
    got_p, got_s = runner(queries, inp, microbatch=4)
    assert got_p.shape == want_p.shape and got_s.shape == want_s.shape
    np.testing.assert_array_equal(np.asarray(got_p) > 0,
                                  np.asarray(want_p) > 0)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               atol=1e-5, rtol=1e-5)


def test_pipelined_parameter_residency():
    """The memory split that motivates pp: coarse params live only on the
    stage-A devices, SAM params only on stage-B."""
    devs = jax.devices()
    pipe, inp = _tiny_pipe()
    runner = PipelinedVolumeRunner(pipe, devs[:2], devs[2:4])

    a_set, b_set = set(devs[:2]), set(devs[2:4])
    coarse_devs = set().union(*(set(l.devices()) for l in
                                jax.tree.leaves(runner.coarse_params)))
    sam_devs = set().union(*(set(l.devices()) for l in
                             jax.tree.leaves(runner.sam_params)))
    assert coarse_devs == a_set
    assert sam_devs == b_set


def test_pipelined_ragged_and_stage_sizes():
    """N not a multiple of the microbatch pads and crops; 1-device stages
    work too."""
    devs = jax.devices()
    pipe, inp = _tiny_pipe()
    queries = jax.random.normal(jax.random.PRNGKey(5), (5, 3, 126, 126))
    want_p, _ = pipe.forward_volume(queries, inp, slice_batch=2)
    runner = PipelinedVolumeRunner(pipe, devs[4:5], devs[5:6])
    got_p, got_s = runner(queries, inp, microbatch=2)
    assert got_p.shape == (5, 126, 126) and got_s.shape[0] == 5
    np.testing.assert_array_equal(np.asarray(got_p) > 0,
                                  np.asarray(want_p) > 0)
