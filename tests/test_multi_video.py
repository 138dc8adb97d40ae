"""Multi-video dataset combination + triplet training across videos."""
import numpy as np
import pytest

from svtpu.config import TrainConfig, VideoMeta, rbvae_variant
from svtpu.data.multi import OFFSET, MultiStore, combine_videos
from svtpu.training.trainer import Trainer


class ArrayStore:
    def __init__(self, n, base):
        rng = np.random.default_rng(base)
        self.array = (rng.integers(0, 255, (n, 16, 16, 3), dtype=np.uint8))

    @property
    def item_shape(self):
        return self.array.shape[1:]

    def gather(self, idx):
        return self.array[np.asarray(idx)]


def _spec():
    a = (ArrayStore(48, 0),
         VideoMeta("a", flags=(16, 32), last_frame=47, grey_out=0))
    b = (ArrayStore(30, 1),
         VideoMeta("b", flags=(10,), last_frame=29, grey_out=0))
    return [a, b]


def test_combine_videos_states_and_labels():
    store, splits, labels = combine_videos(_spec(), 0.15, 0.15)
    assert len(splits.train) == 3 + 2          # states concat across videos
    # Video b's ids live in the OFFSET block and map to states 3..4.
    b_ids = [i for i in labels if i >= OFFSET]
    assert b_ids and all(labels[i] in (3, 4) for i in b_ids)
    a_ids = [i for i in labels if i < OFFSET]
    assert all(labels[i] in (0, 1, 2) for i in a_ids)


def test_multistore_gather_routes_by_video():
    specs = _spec()
    store = MultiStore([s for s, _ in specs])
    ids = np.array([[0, OFFSET + 0], [5, OFFSET + 5]])
    out = store.gather(ids)
    assert out.shape == (2, 2, 16, 16, 3)
    np.testing.assert_array_equal(out[0, 0], specs[0][0].array[0])
    np.testing.assert_array_equal(out[0, 1], specs[1][0].array[0])


def test_triplet_training_across_videos():
    store, splits, labels = combine_videos(_spec(), 0.15, 0.15)
    mcfg = rbvae_variant("triplet", latent_dim=6, input_hw=(16, 16))
    tcfg = TrainConfig(batch_size=8, objective="triplet",
                       select_by="val_loss")
    tr = Trainer(mcfg, tcfg, store, splits, flags=[], seed=0,
                 labels_by_index=labels)
    hist = tr.train(num_epochs=1)
    assert np.isfinite(hist["train_losses"][0]["triplet_loss"])
    # consistency over combined states computes with the explicit label map
    w, pct = tr.state_consistency(hist["final_state"].params, 0.2)
    assert 0.0 <= w <= 1.0 and len(pct) == 5


def test_multistore_staging_rows_match_gather():
    """MultiStore.array + rows() (the device-staging interface) must index
    the same frames that gather() returns."""
    import numpy as np

    from svtpu.data.multi import OFFSET, MultiStore

    class S:
        def __init__(self, n, seed):
            self.array = np.random.default_rng(seed).integers(
                0, 255, (n, 4, 4, 3), dtype=np.uint8)

        @property
        def item_shape(self):
            return self.array.shape[1:]

        def rows(self, idx):
            return np.asarray(idx)

        def gather(self, idx):
            return self.array[np.asarray(idx)]

    ms = MultiStore([S(5, 0), S(7, 1)])
    gids = np.array([0, 3, OFFSET + 0, OFFSET + 6, 4])
    np.testing.assert_array_equal(ms.array[ms.rows(gids)], ms.gather(gids))
    assert len(ms.array) == 12


def test_sep_aggregate_min_catches_single_merged_video():
    """TrainConfig.sep_aggregate="min": the mean adjacent-Hamming scalar
    is blind to one video's states all sharing a code while the other
    video separates widely (observed on hardware,
    results/multi_diagnose/control.jsonl — mean sep 9 bits with all four
    chinchess pairs at exactly 0); the min aggregation reports 0."""
    store, splits, labels = combine_videos(_spec(), 0.15, 0.15)
    mcfg = rbvae_variant("contrastive", latent_dim=6, input_hw=(16, 16))

    def make(agg):
        tr = Trainer(mcfg, TrainConfig(batch_size=8, sep_aggregate=agg),
                     store, splits, flags=[], seed=0,
                     labels_by_index=labels)
        # Crafted codes: video a's states (0,1,2) merged on one code,
        # video b's states (3,4) mutually and jointly separated.
        by_state = np.array([[0, 0, 0, 0, 0, 0],
                             [0, 0, 0, 0, 0, 0],
                             [0, 0, 0, 0, 0, 0],
                             [1, 1, 1, 0, 0, 0],
                             [1, 1, 1, 1, 1, 1]], np.float32)

        def fake_val_codes(params, val_idx, temperature, noise, seed):
            return by_state[[labels[i] for i in val_idx]]

        tr._val_codes = fake_val_codes
        return tr.state_separation(None, 0.2)[0]

    assert make("mean") == pytest.approx((0 + 0 + 3 + 3) / 4)
    assert make("min") == 0.0
