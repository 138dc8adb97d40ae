"""Data-layer semantics tests: split arithmetic vs the reference's formula,
pair-builder invariants, segment construction."""
import numpy as np
import pytest

from svtpu.config import VideoMeta, BUILTIN_VIDEOS, parse_transition_flags
from svtpu.data.pairs import build_pairs, epoch_batches
from svtpu.data.segments import assign_label, split_segments


def reference_split(state_segments, test_pct=0.1, val_pct=0.1):
    """The reference's split logic (contrastive_RBVAE_train.py:207-237),
    re-expressed independently for cross-checking."""
    out = []
    for (start, end) in state_segments:
        full = list(range(start, end))
        n = len(full)
        tvc = int(n * (test_pct + val_pct))
        margin = (n - tvc) // 2
        tv = full[margin:margin + tvc]
        tr = full[:margin] + full[margin + tvc:]
        tc = int(round(test_pct / (test_pct + val_pct) * tvc)) if tvc else 0
        out.append((tr, tv[:tc], tv[tc:]))
    return out


def test_split_matches_reference_arithmetic():
    meta = BUILTIN_VIDEOS["chinese_chess"]
    segs = meta.state_segments()
    ours = split_segments(segs, 0.1, 0.1)
    ref = reference_split(segs, 0.1, 0.1)
    for s, (tr, te, va) in enumerate(ref):
        assert list(ours.train[s]) == tr
        assert list(ours.test[s]) == te
        assert list(ours.val[s]) == va
        # middle chunk: test+val contiguous, train = front+back
        assert all(i not in tr for i in te + va)


def test_state_segments_formula():
    meta = VideoMeta("v", (74, 206, 282, 389), 479, 10)
    segs = meta.state_segments()
    assert segs[0] == (0, 64)
    assert segs[1] == (85, 196)
    assert segs[-1] == (400, 480)
    assert len(segs) == meta.num_states == 5


def test_assign_label():
    flags = [10, 20, 30]
    assert assign_label(0, flags) == 0
    assert assign_label(10, flags) == 1
    assert assign_label(29, flags) == 2
    assert assign_label(30, flags) == 3


def test_parse_transition_flags(tmp_path):
    p = tmp_path / "transition_flags.txt"
    p.write_text("vid_a:\n[5, 9], last_frame = 20, grey_out = 1\n\n"
                 "vid_b:\n[3], last_frame = 7, grey_out = 0\n")
    metas = parse_transition_flags(p)
    assert metas["vid_a"].flags == (5, 9)
    assert metas["vid_a"].last_frame == 20
    assert metas["vid_b"].grey_out == 0


def test_build_pairs_invariants():
    states = [list(range(0, 11)), list(range(20, 25)), [30]]
    table = build_pairs(states, seed=3)
    n_pairs, n_states, two = table.shape
    assert n_states == 3 and two == 2
    # Every index belongs to its state's range.
    for s, idx in enumerate(states):
        vals = set(table[:, s, :].reshape(-1).tolist())
        assert vals <= set(idx)
    # Largest state determines pair count: 11 frames → 6 pairs (odd leftover
    # gets a mate), matching the reference's pairing arithmetic.
    assert n_pairs == 6
    # Determinism.
    np.testing.assert_array_equal(table, build_pairs(states, seed=3))
    assert not np.array_equal(table, build_pairs(states, seed=4))


def test_build_pairs_covers_each_even_state_exactly_once():
    states = [list(range(100, 110))]
    table = build_pairs(states, seed=0)
    used = sorted(table[:, 0, :].reshape(-1).tolist())
    assert used == list(range(100, 110))  # disjoint pairs, full cover


def test_epoch_batches_pads_to_static_shape():
    table = build_pairs([list(range(10)), list(range(20, 30))], seed=0)
    batches = epoch_batches(table, batch_size=4, seed=1)
    assert batches.shape[1:] == (4, 2, 2)
    assert batches.shape[0] == -(-len(table) // 4)


def test_random_pair_batcher():
    from svtpu.data.datasets import RandomPairBatcher

    class Store:
        def gather(self, idx):
            idx = np.asarray(idx)
            return np.broadcast_to(idx[..., None, None, None],
                                   idx.shape + (4, 4, 3)).astype(np.uint8)

    segs = [(0, 10), (20, 21), (30, 40)]
    b = RandomPairBatcher(Store(), segs, batch_size=4, num_items=10, seed=0)
    batches = list(b.epoch(0))
    assert len(batches) == 3
    x = batches[0]
    assert x.shape == (4, 2, 3, 4, 4, 3)
    # pair members within a state are distinct when >1 frame exists
    vals = x[..., 0, 0, 0]
    assert (vals[:, 0, 0] != vals[:, 1, 0]).all()      # state 0: 10 frames
    assert (vals[:, 0, 1] == 20).all() and (vals[:, 1, 1] == 20).all()
    # determinism by (seed, epoch)
    again = list(RandomPairBatcher(Store(), segs, 4, 10, seed=0).epoch(0))
    np.testing.assert_array_equal(batches[0], again[0])


def test_visualize_summary():
    from svtpu.config import rbvae_variant
    from svtpu.models.visualize import summarize

    cfg = rbvae_variant("contrastive", latent_dim=6, input_hw=(32, 32))
    table = summarize(cfg)
    assert "encoder_cnn" in table and "decoder_rnn" in table


def test_temperature_schedule_matches_stateful_reference():
    """Our pure schedule vs a simulation of the reference's stateful
    annealer (contrastive_RBVAE_train.py:392-405)."""
    import numpy as np
    from svtpu.training.schedules import temperature_schedule

    init, final, rate, n = 2.0, 0.2, 1e-3, 7

    # Stateful reference behavior: global_step incremented before the read;
    # temperature only recomputed when step % n == 0.
    cur = init
    ours, ref = [], []
    for step in range(1, 300):
        if step % n == 0:
            cur = max(final, init * np.exp(-rate * step))
        ref.append(cur)
        ours.append(float(temperature_schedule(step, init, final, rate, n)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_symbol_store_roundtrip(tmp_path):
    from svtpu.data.symbols import SymbolStore, pack_codes, unpack_codes

    rng = np.random.default_rng(0)
    codes = (rng.random((10, 25)) > 0.5).astype(np.uint8)
    ids = np.arange(100, 110)
    store = SymbolStore(codes, ids, labels=np.arange(10) // 3)
    assert store.packed.shape == (10, 4)      # ceil(25/8)
    np.testing.assert_array_equal(store.codes, codes)
    np.testing.assert_array_equal(store.code_of(103), codes[3])

    p = tmp_path / "sym.npz"
    store.save(p)
    back = SymbolStore.load(p)
    np.testing.assert_array_equal(back.codes, codes)
    np.testing.assert_array_equal(back.labels, store.labels)
    assert len(back) == 10
    np.testing.assert_array_equal(
        unpack_codes(pack_codes(codes), 25), codes)
