"""Video mask refinement (the SAM2 slot — optimizer.py:226-301 protocol:
parity-split cross-propagation, OR into the originals)."""
import numpy as np
import pytest

from das3r_tpu.predictor import mask_refine


def _square(f, x0, size=4, hw=(16, 24)):
    m = np.zeros(hw, bool)
    m[6:6 + size, x0:x0 + size] = True
    return m


def test_parity_protocol_seeds_and_targets():
    """Even frames must be refined only from odd seeds and vice versa."""
    calls = []

    class Spy:
        def propagate(self, images01, seeds, n_frames):
            calls.append(sorted(seeds))
            return {t: np.ones((4, 4), bool) for t in range(n_frames)
                    if t not in seeds}

    masks = np.zeros((5, 4, 4), bool)
    out = mask_refine.refine_motion_masks(masks, propagator=Spy())
    assert calls == [[1, 3], [0, 2, 4]]      # odd seeds, then even seeds
    assert out.all()                          # propagation ORed everywhere


def test_or_semantics_never_shrinks():
    masks = np.stack([_square(f, 4 + 2 * f) for f in range(6)])

    class Empty:
        def propagate(self, images01, seeds, n_frames):
            return {}

    out = mask_refine.refine_motion_masks(masks, propagator=Empty())
    np.testing.assert_array_equal(out, masks)  # nothing propagated
    out2 = mask_refine.refine_motion_masks(masks)
    assert (out2 & masks).sum() == masks.sum()  # original always kept
    assert out2.sum() >= masks.sum()


def test_neighbor_propagator_dilates_with_distance():
    hw = (16, 24)
    seeds = {0: _square(0, 8, hw=hw)}
    p = mask_refine.NeighborPropagator(dilate_per_step=1)
    prop = p.propagate(None, seeds, 4)
    # farther frames get wider masks
    assert prop[1].sum() > seeds[0].sum()
    assert prop[3].sum() > prop[1].sum()


def test_neighbor_propagator_respects_prior():
    hw = (16, 24)
    prior = np.zeros((2,) + hw, np.float32)
    prior[1, :, :12] = 1.0                    # only left half is dynamic
    seeds = {0: _square(0, 8, hw=hw)}
    p = mask_refine.NeighborPropagator(dilate_per_step=3, prior=prior)
    prop = p.propagate(None, seeds, 2)
    assert prop[1][:, 12:].sum() == 0         # confined to the prior
    assert prop[1].any()


def test_moving_object_gap_fill():
    """A detection dropout in one frame is filled from its neighbors —
    the purpose of the reference's video propagation."""
    masks = np.stack([_square(f, 6 + f) for f in range(5)])
    masks[2] = False                          # frame 2 missed the object
    out = mask_refine.refine_motion_masks(masks)
    assert out[2].any(), "dropout frame must be recovered"
    # recovered region overlaps where the object actually is
    assert (out[2] & _square(2, 8)).any()


def test_sam2_adapter_raises_without_package():
    with pytest.raises(ImportError, match="sam2"):
        mask_refine.Sam2Propagator("ckpt.pt", "cfg.yaml")
