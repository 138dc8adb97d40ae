"""Typed configuration system.

Replaces the reference's three disjoint config mechanisms (hard-coded
``__main__`` constants, ``wandb.config`` dicts, and OmegaConf YAML reflection —
see reference ``models/contrastive_RBVAE/contrastive_RBVAE_train.py:692-747``,
``models/*/*_wandb_sweep.py``, ``src/stable-diffusion/ldm/util.py:78-93``) with
one set of dataclasses used by every entry point.
"""
from __future__ import annotations

import dataclasses
import json
import re
from pathlib import Path
from typing import Optional, Tuple


# ---------------------------------------------------------------------------
# Video metadata
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class VideoMeta:
    """Per-video state-transition metadata.

    Mirrors the reference's ``videos/frames/transition_flags.txt`` entries:
    ``flags`` are the frame indices at which a state transition occurs,
    ``last_frame`` is the final frame index (inclusive), ``grey_out`` is the
    margin of frames dropped on both sides of every transition.
    """

    name: str
    flags: Tuple[int, ...]
    last_frame: int
    grey_out: int = 10

    @property
    def num_states(self) -> int:
        return len(self.flags) + 1

    def state_segments(self) -> Tuple[Tuple[int, int], ...]:
        """Half-open ``(start, end)`` per state, transition margins removed.

        Same arithmetic as reference ``contrastive_RBVAE_train.py:700-707``
        (the canonical formula; the off-by-one variant in
        ``triplet_RBVAE_train.py:633-641`` is intentionally not reproduced).
        """
        segs = []
        for i, flag in enumerate(self.flags):
            if i == 0:
                segs.append((0, flag - self.grey_out))
            else:
                segs.append((self.flags[i - 1] + self.grey_out + 1,
                             flag - self.grey_out))
        segs.append((self.flags[-1] + self.grey_out + 1, self.last_frame + 1))
        return tuple(segs)


def parse_transition_flags(path: str | Path) -> dict[str, VideoMeta]:
    """Parse a ``transition_flags.txt``-style metadata file.

    Format (reference ``videos/frames/transition_flags.txt:1-11``)::

        video_name:
        [f0, f1, ...], last_frame = N, grey_out = M
    """
    text = Path(path).read_text()
    metas: dict[str, VideoMeta] = {}
    name = None
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.endswith(":"):
            name = line[:-1].strip()
            continue
        m = re.match(
            r"\[(?P<flags>[\d,\s]*)\]\s*,\s*last_frame\s*=\s*(?P<last>\d+)"
            r"\s*,\s*grey_out\s*=\s*(?P<grey>\d+)", line)
        if m and name is not None:
            flags = tuple(
                int(x) for x in m.group("flags").split(",") if x.strip())
            metas[name] = VideoMeta(
                name=name, flags=flags, last_frame=int(m.group("last")),
                grey_out=int(m.group("grey")))
            name = None
    return metas


# The four videos the reference ships metadata for
# (``videos/frames/transition_flags.txt``).
BUILTIN_VIDEOS = {
    "kid_playing_with_blocks": VideoMeta(
        "kid_playing_with_blocks",
        (152, 315, 486, 607, 734, 871, 1153, 1343), 1425, 10),
    "chinese_chess": VideoMeta(
        "chinese_chess", (74, 206, 282, 389), 479, 10),
    "assembly_C10118": VideoMeta(
        "assembly_C10118",
        (2836, 4132, 5114, 5640, 6922, 8390, 11518, 11962), 12297, 20),
    "ikea_asm_table": VideoMeta(
        "ikea_asm_table",
        (157, 205, 441, 494, 557, 887, 909, 1010, 1048, 1315, 1388, 1438,
         1702, 1847, 2096, 2174), 2469, 1),
}


# ---------------------------------------------------------------------------
# Model configuration
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RBVAEConfig:
    """One parameterized config covering all four reference variants.

    Reference variants (SURVEY.md §2.2):
      * simple      — ``models/simple_RBVAE/simple_RBVAE_model.py:77-193``
      * contrastive — ``models/contrastive_RBVAE/contrastive_RBVAE_model.py:45-191``
      * percep      — ``models/percep_RBVAE/percep_RBVAE_model.py:46-191``
      * triplet     — ``models/triplet_RBVAE/triplet_RBVAE_model.py:47-193``
    """

    variant: str = "contrastive"
    in_channels: int = 3
    out_channels: int = 3
    latent_dim: int = 32
    # Input spatial size (H, W). 256x256 pixels (contrastive/triplet),
    # 64x64 (simple), 88x160 SD latents (percep).
    input_hw: Tuple[int, int] = (256, 256)
    # Conv trunk: per-stage output channels; kernel/stride/padding.
    conv_features: Tuple[int, ...] = (64, 64, 64)
    conv_kernel: int = 3
    conv_stride: int = 2
    conv_padding: int = 1
    conv_dropout: float = 0.2
    # Whether the encoder trunk applies ReLU after the LAST conv as well.
    # The simple variant does (``simple_RBVAE_model.py:82-89`` —
    # Conv,ReLU ×3 then Flatten); contrastive/percep/triplet end on the
    # bare conv (``contrastive_RBVAE_model.py:49-58``). Caught by the
    # genuine-class parity tests (round 3) — a hand-written twin had
    # masked it.
    conv_final_relu: bool = False
    # LSTM depth (1=simple, 2=contrastive/triplet, 4=percep). Hidden size is
    # wired to latent_dim in every reference variant
    # (``contrastive_RBVAE_model.py:139-140``).
    lstm_layers: int = 2
    # svtpu extension (off by default — reference has plain stacks): add an
    # identity path around width-preserving LSTM layers. Motivated by the
    # round-3 percep diagnosis: 4 plain stacked LSTMs starve the
    # binarization logits (RESULTS.md "Percep collapse").
    lstm_residual: bool = False
    # Where binarization happens: "pre_rnn" = on CNN logits before the LSTMs
    # (simple, ``simple_RBVAE_model.py:177``); "post_rnn" = on encoder-LSTM
    # output (all others, ``contrastive_RBVAE_model.py:158``).
    binarize: str = "post_rnn"
    # Binary-Concrete epsilon: 1e-10 simple, 1e-8 others.
    bc_eps: float = 1e-8
    # Whether the noise_ratio multiplier exists (contrastive/percep only;
    # simple/triplet use unscaled logistic noise == noise_ratio 1.0).
    has_noise_ratio: bool = True
    # Final decoder nonlinearity. The reference uses Sigmoid for every
    # variant, including percep whose targets are not in [0,1] — preserved.
    decoder_sigmoid: bool = True
    # Compute dtype for conv/matmul ("bfloat16" on TPU, "float32" for parity
    # tests). Params are always float32.
    compute_dtype: str = "float32"
    # Rematerialize the conv trunks in the backward pass (jax.checkpoint):
    # trades ~30% more FLOPs for O(batch) less activation HBM — lets the
    # 256x256 trunk train at much larger per-chip batch.
    remat: bool = False
    # Use the fused Pallas Binary-Concrete sampler (on-chip PRNG) on the
    # inference ``encode`` path instead of the XLA op. Training always uses
    # the XLA op (it needs the soft VJP). A/B'd in benchmarks/bench_suite.py;
    # see DESIGN.md §4 for the measured delta.
    pallas_sampler: bool = False
    # Use the fused Pallas conv1->conv2 trunk on the inference ``encode``
    # path (ops/conv_trunk_pallas.py): the whole stride-2 64-channel
    # trunk runs from VMEM, instead of XLA's lowering that round-trips
    # ~1 GB/batch of activations through HBM at 16% of bf16 peak
    # (RESULTS.md round-2 breakdown). Contrastive/triplet pixel geometry
    # only; training always uses the XLA path (it needs the VJP).
    pallas_trunk: bool = False
    # Images per Pallas-trunk grid step (>1 amortizes the per-step
    # grid/copy overhead round 2 measured as the kernel's bound; the
    # batch must divide by it or it falls back to 1). VMEM per step is
    # ~2.6 MB/image double-buffered, so 2-4 is the useful range.
    pallas_trunk_block: int = 1
    # Run the wide convs (all but conv0) of the inference ``encode`` path
    # in dynamic symmetric int8 (per-output-channel kernel scales,
    # per-tensor activation scale, int32 accumulation — ops/conv.py
    # ``conv2d_int8``). v5e's int8 MXU peak is 2x bf16; the encode output
    # is binary codes behind a hard threshold, so precision headroom
    # exists. Inference-only (no gradient through round); code-mismatch
    # vs the bf16 path must be measured per checkpoint before production
    # use (benchmarks/bench_suite.py int8 benches).
    int8_trunk: bool = False
    # Compute the first (thin, k3/s2/p1) conv via a 2x2 space-to-depth
    # transform: mathematically identical, but the MXU contraction axis
    # grows 9*C_in -> 16*C_in (the classic TPU conv0 trick). Same
    # parameters either way; A/B'd in benchmarks/bench_suite.py.
    conv0_s2d: bool = False
    # Compute the decoder's k3/s2/p1/op1 transposed convs as k2/s1 convs +
    # 2x2 depth-to-space (sub-pixel): identical math, no dilated-zero
    # arithmetic, 4x-wider MXU output-lane axis. Same parameters either
    # way; A/B'd in benchmarks/bench_suite.py.
    deconv_d2s: bool = False

    @property
    def encoded_hw(self) -> Tuple[int, int]:
        h, w = self.input_hw
        for _ in self.conv_features:
            h = (h + 2 * self.conv_padding - self.conv_kernel) // self.conv_stride + 1
            w = (w + 2 * self.conv_padding - self.conv_kernel) // self.conv_stride + 1
        return (h, w)

    @property
    def encoded_dim(self) -> int:
        h, w = self.encoded_hw
        return self.conv_features[-1] * h * w


def rbvae_variant(name: str, latent_dim: int = 32, *,
                  compute_dtype: str = "float32", **overrides) -> RBVAEConfig:
    """Factory for the four reference variants by name.

    Also accepts the sweep-space aliases ``contrastive_z``/``contrastive_p``
    (``sweeps/spaces.py``) so eval paths fed a sweep's variant name resolve
    to the contrastive model instead of raising.
    """
    name = {"contrastive_z": "contrastive",
            "contrastive_p": "contrastive",
            "percep_p": "percep"}.get(name, name)
    base = dict(latent_dim=latent_dim, compute_dtype=compute_dtype)
    if name == "simple":
        cfg = dict(
            variant="simple", input_hw=(64, 64), conv_features=(64, 128, 256),
            conv_kernel=4, conv_dropout=0.0, conv_final_relu=True,
            lstm_layers=1, binarize="pre_rnn", bc_eps=1e-10,
            has_noise_ratio=False)
    elif name == "contrastive":
        cfg = dict(variant="contrastive")
    elif name == "triplet":
        cfg = dict(variant="triplet", has_noise_ratio=False)
    elif name == "percep":
        cfg = dict(
            variant="percep", in_channels=4, out_channels=4,
            input_hw=(88, 160), conv_features=(256, 256, 256), lstm_layers=4)
    else:
        raise ValueError(f"unknown RBVAE variant: {name!r}")
    cfg.update(base)
    cfg.update(overrides)
    return RBVAEConfig(**cfg)


# ---------------------------------------------------------------------------
# Training configuration
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Trainer hyperparameters (reference trainer ctor args, SURVEY.md §2.5)."""

    batch_size: int = 32
    num_epochs: int = 50
    learning_rate: float = 1e-3
    init_temperature: float = 1.0
    final_temperature: float = 0.5
    anneal_rate: float = 1e-3
    num_steps_to_update: int = 100
    bernoulli_p: float = 0.1
    noise_ratio: float = 0.1
    # Noise ratio for the *metric/selection* encodes (consistency,
    # separation). None = use noise_ratio. Letting them differ enables
    # noise-hardened training: train against strong Binary-Concrete noise
    # (sharpens logits) while selecting checkpoints under the standard
    # eval protocol.
    eval_noise_ratio: Optional[float] = None
    margin: float = 0.2
    alpha: float = 1.0           # contrastive or triplet coefficient
    beta_kl: float = 1.0
    test_pct: float = 0.1
    val_pct: float = 0.1
    seed: int = 0
    # Loss family: "contrastive" | "triplet" | "simple".
    objective: str = "contrastive"
    # Triplet distance: "l2" (reference default, F.triplet_margin_loss) or
    # "js" (the reference's defined-but-unused Bernoulli-JS triplet,
    # ``triplet_RBVAE_train.py:99-119``, computed on z_seq probabilities).
    triplet_distance: str = "l2"
    # Weight of an explicit anchor<->positive pull term added to the
    # TRIPLET objective: the contrastive similar-pair attraction (squared
    # distance, label-0 half of ``contrastive_RBVAE_train.py:79-107``)
    # computed in p-space (``sigmoid(h)``) between the two pair members of
    # each state. Motivation (measured, RESULTS.md "triplet_on='p'"):
    # four arms pinned the triplet collapse on its TOPOLOGY — anchor/
    # positive/negative margins only shape relative distances and are
    # satisfiable with every frame on a unique code, so nothing rewards
    # within-state code identity in any parameterization; the contrastive
    # hinge escapes exactly because of its similar-pair pull. This wires
    # that one missing force onto the reference's triplet formulation.
    # 0 disables (the reference triplet, ``triplet_RBVAE_train.py:461-468``,
    # has no such term).
    triplet_pull: float = 0.0
    # Round-5 measurement (RESULTS.md "triplet repair"): the pull alone is
    # INERT at the triplet's collapsed fixed point — |h| never leaves ~0,
    # where p-space distances are O(1e-9) while deterministic codes are
    # hair-trigger sign patterns, so the pull supplies no force at any
    # weight. The scale-growing force the contrastive objective has and
    # the triplet lacks is its DISSIMILAR hinge. triplet_push wires that
    # one force on: an ABSOLUTE margin on the triplet's own
    # (anchor, negative) frames in p-space — max(0, margin - d(p_a, p_n))²
    # — replacing nothing (the relative triplet margin stays), 0 disables.
    triplet_push: float = 0.0
    # Representation the contrastive/triplet losses act on: "h" (reference:
    # the continuous encoder-LSTM output), "z" (the relaxed Binary-
    # Concrete probabilities — ties the margin to the binarization boundary
    # and counteracts the all-states-one-code collapse; DESIGN.md §8), or
    # "p" (sigmoid(h): the deterministic bit probabilities at unit
    # temperature — same boundary coupling as "z" but immune to the
    # gradient death "z" suffers once the sampling temperature anneals low
    # and sigmoid((h+noise)/T) saturates; DESIGN.md §8).
    contrast_on: str = "h"
    # Also apply the contrastive margins to context-free (T=1) encodes of
    # the same frames, averaged 50/50 with the in-context terms. The eval
    # protocol encodes single frames, but the reference's loss only
    # constrains in-context codes — the two drift apart late in training
    # (in-context separation holds while single-frame codes merge;
    # RESULTS.md round 2). Costs one extra encoder pass per step.
    contextfree_contrast: bool = False
    # Model selection: "consistency" (contrastive/percep,
    # ``contrastive_RBVAE_train.py:662-673``), "val_loss" (triplet,
    # ``triplet_RBVAE_train.py:597-608``), or the svtpu additions
    # "separation" (maximize deterministic adjacent-state Hamming) and
    # "combined" (consistency x min(separation/sep_target, 1) — rewards
    # checkpoints that are BOTH consistent within states and separated
    # between them; the reference metric alone is blind to all-states-
    # one-code collapse, DESIGN.md §8).
    select_by: str = "consistency"
    # Separation (bits) at which "combined" stops rewarding more
    # separation and becomes pure consistency.
    sep_target: float = 3.0
    # How the adjacent-pair Hamming vector reduces to the separation
    # scalar: "mean" (default; matches the single-video metric) or "min".
    # "min" matters for multi-video runs: the round-3 diagnosis showed a
    # 9-state run whose MEAN separation sat at 9 bits while all four
    # chinchess in-video pairs were at exactly 0 from epoch 100 — mean
    # aggregation (and therefore combined-score selection) is blind to
    # one video collapsing when another separates widely
    # (results/multi_diagnose/control.jsonl).
    sep_aggregate: str = "mean"
    log_dir: Optional[str] = None
    # Mesh axes for data parallelism; batch is sharded over "data".
    mesh_shape: Tuple[int, ...] = (-1,)
    mesh_axes: Tuple[str, ...] = ("data",)
    # Stage the whole frame/embedding store in device HBM and feed the
    # jitted steps row indices instead of frame batches: "auto" (stage when
    # the store is <=2 GiB), True (always), False (never). Cuts per-step
    # host->device traffic from the frame batch to KBs of indices.
    stage_frames: object = "auto"
    # Fuse each training epoch into ONE device dispatch: with a staged
    # bank every batch is a same-shape row-index array, so the whole
    # epoch's batches stack into [steps, B, 2, S] and a lax.scan over the
    # train step runs them in a single jit call. The step sequence, PRNG
    # folds and update math are identical to the per-step loop (the scan
    # body IS the train step); what changes is dispatch count — one relay
    # round-trip per epoch instead of one per step plus one metric
    # readback per step (the dominant per-epoch cost on small datasets
    # through the axon relay, RESULTS.md "Training path"). Falls back to
    # the per-step loop when frames are not staged or per-batch TB
    # logging (log_every) is requested.
    fused_epoch: bool = True
    # Multi-chip batch/LR policy. svtpu's batch_size is the GLOBAL batch
    # (sharded over the data axis), so unlike the reference's dormant DDP
    # harness (``main.py:686-690``: lr = accumulate x ngpu x bs x base_lr,
    # where the per-GPU batch is fixed and the global batch grows with
    # ngpu) the learning rate needs no device-count factor. The one place
    # the effective batch can change implicitly is the round-up to a
    # data-axis multiple; "linear" rescales lr by new_batch/requested_batch
    # there (the same linear convention, applied to what actually changed),
    # "none" keeps base_lr untouched.
    lr_scaling: str = "linear"
    # Save the ``latest`` checkpoint every N epochs even when the selection
    # metric has not improved, bounding the work a crash/resume can lose to
    # N epochs (``latest`` is otherwise only written on metric improvement,
    # which can stall for hundreds of epochs on plateaus). 0 disables.
    latest_every: int = 25
    # Run the validation block (val losses + consistency/separation
    # probes) every N epochs instead of every epoch. On small datasets
    # the per-epoch wall-clock is dominated by the probes, not the train
    # step (RESULTS.md "Training path": flagship geometry ~0.57 s of
    # train updates vs ~0.9 s of validation per epoch), so N>1 buys a
    # direct wall-clock reduction at the cost of selection granularity:
    # best-checkpoint selection, the basin/restart check, and the trap
    # guard only observe probed epochs. The final epoch and the restart
    # check epoch are always probed. 1 = every epoch (the reference's
    # behavior, ``contrastive_RBVAE_train.py:640-676``).
    val_every: int = 1
    # Auto-restart on basin failure (svtpu addition; the reference has no
    # recovery from a bad init). The round-3 5-seed replication showed a
    # bimodal outcome: 4/5 seeds separate >=14 bits, 1/5 never leaves the
    # collapsed basin — and the failure is detectable early (separation
    # still 0 and contrast loss stuck high by epoch ~200,
    # RESULTS.md "Flagship replication"). If the running-max validation
    # separation is below ``restart_min_sep`` when ``restart_check_epoch``
    # epochs have elapsed since the last (re)start, re-initialize
    # parameters/optimizer with a folded seed and restart the temperature
    # schedule, at most ``max_restarts`` times, within the same total
    # epoch budget. 0 disables.
    restart_check_epoch: int = 0
    restart_min_sep: float = 3.0
    max_restarts: int = 3
    # Which reduction of the per-pair Hamming vector the basin check
    # compares against ``restart_min_sep``: "mean" (default — thresholds
    # were calibrated on mean bits, and a healthy single-video run whose
    # weakest pair is still closing must not be re-rolled) or "min" (for
    # multi-video per-VIDEO basin failure, where one merged pair hides
    # behind a healthy mean: queue15's braked arm held mean 21.9 with
    # chinchess pair 3 at exactly 0 bits for 1500 epochs,
    # results/multi_diagnose/braked.jsonl).
    restart_on: str = "mean"
    # What an auto-restart re-rolls. "init" (default): parameters and
    # optimizer only — the reference-faithful reading of basin failure as
    # an unlucky init. "stream": ALSO rebuild the train pair table and the
    # training noise key with the restart's seed offset. Motivation
    # (measured, RESULTS.md round 4): on flagship seed 7 three independent
    # param inits (offsets 0/1000/2000) failed IDENTICALLY — pair 3 merged
    # in every leg — while the one thing the restart did not change was
    # the run-fixed pair table (built once at init, like the reference,
    # ``contrastive_RBVAE_train.py:244-294``) and the noise stream; seeds
    # whose streams differ (3, 6) hold pair 3 fine. Re-rolling only the
    # init re-rolls the variable that measurably does not carry the
    # failure.
    restart_reroll: str = "init"
    # Adaptive anneal guard against the late-anneal gradient trap (svtpu
    # addition). The measured trap condition is the RATIO |h|/T — relaxed
    # probabilities saturate and the p(1-p)/T gradient dies once the
    # context-free logit scale outgrows the temperature (trigger temps
    # 0.41-0.92 across runs, scaling with each run's |h|; RESULTS.md
    # "7-seed replication", "Multi-video"). A FIXED floor only helps when
    # it happens to sit above that run's threshold (seed 8 trapped AT the
    # 0.55 floor, and a one-time freeze at the crossing temperature still
    # eroded 460 epochs later because |h| kept growing — the causal
    # seed-8 arms, RESULTS.md "trap guard"). When ``trap_guard_ratio`` >
    # 0, the trainer probes the context-free mean |h| on a val batch each
    # epoch and keeps the effective temperature floor at |h|/ratio — a
    # floor that RISES with the logit scale, pinning the ratio at the
    # band for the rest of the run. Hard-threshold val/selection metrics
    # are temperature-invariant, so selection semantics are unchanged.
    # 0 disables.
    trap_guard_ratio: float = 0.0
    # L1 coefficient on the binarization logits h (sum over latent, mean
    # over batch/time — the KL's reduction convention). The reference
    # defines an L1 sparsity term but never uses it
    # (``contrastive_RBVAE_train.py:28-30``); svtpu wires it because the
    # late-anneal trap is driven by unbounded |h| growth (measured 16×
    # under a pinned-ratio temperature, RESULTS.md "trap guard") and a
    # constant L1 pull is the direct brake on that growth. 0 disables.
    l1_logits: float = 0.0


@dataclasses.dataclass(frozen=True)
class PerceptualConfig:
    """SD AutoencoderKL first-stage config (v1-inference.yaml:46-67)."""

    embed_dim: int = 4
    z_channels: int = 4
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    in_channels: int = 3
    out_ch: int = 3
    scale_factor: float = 0.18215
    # Preprocessing: resize target before %32 snap
    # (``get_percep_embeddings.py:59-66``) — 1280x720 → 1280x704.
    resize_wh: Tuple[int, int] = (1280, 720)
    compute_dtype: str = "bfloat16"


def to_json(cfg) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2)


def from_json(cls, s: str):
    d = json.loads(s)
    for f in dataclasses.fields(cls):
        if f.name in d and isinstance(d[f.name], list):
            d[f.name] = tuple(d[f.name])
    return cls(**d)
