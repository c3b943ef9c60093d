"""Typed, immutable configuration for the TPU-native MMT framework.

The reference drives everything off one mutable flat JSON/argparse Namespace
(`/root/reference/utils_MMT/config_V8.json`, parsed by
`execution_function_v15_4.py:20`) whose fields are overwritten in place by
each pipeline stage. Here the configuration is split into small frozen
dataclasses per subsystem; stages produce *new* configs instead of mutating.

All sequence lengths are compile-time constants (static shapes are the
TPU-idiomatic replacement for the reference's dynamic padding):

- each spectrum is padded to ``spectrum_points`` points
  (reference: ``padding_points_number=64``),
- every per-modality encoder sequence is
  ``[spectrum | MF | (MS) | MW]`` giving 129 (193 with MS) tokens for the
  NMR modalities and 66 (130) for IR, matching the reference layout
  constants (`models_MMT_v15_4.py:834-835`),
- the fused memory is the concatenation of all five modality memories.

The reference substitutes a 65-token blank for an inactive COSY encoder
where every other modality uses 129 (`models_MMT_v15_4.py:912-914`) — an
inconsistency we reproduce only behind ``parity_cosy_blank_65``.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Any, Mapping, Optional, Sequence

SPECTRUM_MODALITIES: tuple[str, ...] = ("1H", "13C", "HSQC", "COSY", "IR")
CONDITIONING: tuple[str, ...] = ("MF", "MS", "MW")
ALL_MODALITIES: tuple[str, ...] = SPECTRUM_MODALITIES + CONDITIONING


@dataclass(frozen=True)
class ModalityConfig:
    """Which modalities the model consumes.

    Mirrors the reference's ``training_mode`` substring matching
    (`models_MMT_v15_4.py:560` etc.) with an explicit, typed surface.
    """

    use_1h: bool = True
    use_13c: bool = True
    use_hsqc: bool = True
    use_cosy: bool = True
    use_ir: bool = True
    use_mf: bool = True
    use_ms: bool = False
    use_mw: bool = True

    @classmethod
    def from_training_mode(cls, mode: str) -> "ModalityConfig":
        """Parse a reference-style training_mode string like
        ``"1H_13C_HSQC_COSY_IR_MF_MW"``. Uses the same substring semantics
        as the reference (so ``"13C"`` does not imply ``"1H"``... but note
        ``"1H"`` IS a substring of e.g. ``"11H"``; we split on underscores
        to be unambiguous while remaining compatible with every mode string
        the reference actually uses).
        """
        parts = set(mode.split("_"))
        return cls(
            use_1h="1H" in parts,
            use_13c="13C" in parts,
            use_hsqc="HSQC" in parts,
            use_cosy="COSY" in parts,
            use_ir="IR" in parts,
            use_mf="MF" in parts,
            use_ms="MS" in parts,
            use_mw="MW" in parts,
        )

    def to_training_mode(self) -> str:
        parts = []
        for name, flag in (
            ("1H", self.use_1h),
            ("13C", self.use_13c),
            ("HSQC", self.use_hsqc),
            ("COSY", self.use_cosy),
            ("IR", self.use_ir),
            ("MF", self.use_mf),
            ("MS", self.use_ms),
            ("MW", self.use_mw),
        ):
            if flag:
                parts.append(name)
        return "_".join(parts)

    @property
    def active_spectra(self) -> tuple[str, ...]:
        return tuple(
            m
            for m, f in zip(
                SPECTRUM_MODALITIES,
                (self.use_1h, self.use_13c, self.use_hsqc, self.use_cosy, self.use_ir),
            )
            if f
        )


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters of the MultimodalTransformer.

    Defaults reproduce the reference model
    (`models_MMT_v15_4.py:487-546`, `config_V8.json`): d_model=128,
    16 heads (4 for the fusion encoder = num_heads/4), 6 layers per
    encoder/decoder, FFN width 2048 (the PyTorch TransformerEncoderLayer
    default — the reference's ``forward_expansion`` field is unused).
    """

    hidden_size: int = 128
    num_heads: int = 16
    cross_num_heads: int = 4
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    ffn_dim: int = 2048
    dropout: float = 0.1  # one rate everywhere, like the reference's drop_out
    layer_norm_eps: float = 1e-5

    smiles_vocab_size: int = 43  # in_size / out_size / MS_vocab_size
    mf_vocab_size: int = 212  # MF_vocab_size
    fingerprint_size: int = 512
    max_len: int = 128  # decoder positional-embedding table size

    spectrum_points: int = 64  # padding_points_number
    mf_len: int = 64
    ms_len: int = 64
    ir_bins: int = 1000  # input_dim_IR

    modalities: ModalityConfig = dataclasses.field(default_factory=ModalityConfig)

    # Alternative output blend path used when fine-tuning on experimental
    # data (`models_MMT_v15_4.py:965-971`).
    use_real_data: bool = False

    # Reproduce the reference's 65-token blank-COSY substitution
    # (`models_MMT_v15_4.py:912`). True by default so converted reference
    # checkpoints behave identically; set False for the fixed layout.
    parity_cosy_blank_65: bool = True

    # Compute dtype for matmuls/attention. Parity checks run in float32;
    # production inference uses bfloat16.
    dtype: str = "float32"

    # Rematerialize encoder/decoder layers in the backward pass
    # (jax.checkpoint). Without it the [B,H,S,S] attention scores of every
    # layer stay alive for the gradient (~37 GB at batch 256 on the full
    # model); with it, activation memory is O(layers) smaller at the cost
    # of one cheap recompute. Identical params and outputs.
    remat: bool = False

    @classmethod
    def small(cls, **overrides) -> "ModelConfig":
        """The ONE canonical --small config (2+2 layers, ffn 512). Every
        entry point must use this so a --small-trained checkpoint loads
        back everywhere (a divergent ffn_dim made eval/serve reject
        train's artifacts)."""
        kw = dict(num_encoder_layers=2, num_decoder_layers=2, ffn_dim=512)
        kw.update(overrides)
        return cls(**kw)

    # ---- derived static layout -------------------------------------------------
    @property
    def cond_len(self) -> int:
        """Length of the conditioning suffix [MF|MS|MW] on every modality."""
        n = 0
        if self.modalities.use_mf:
            n += self.mf_len
        if self.modalities.use_ms:
            n += self.ms_len
        if self.modalities.use_mw:
            n += 1
        return n

    @property
    def nmr_seq_len(self) -> int:
        """Per-modality sequence length for 1H/13C/HSQC/COSY (ref: 129/193)."""
        return self.spectrum_points + self.cond_len

    @property
    def ir_seq_len(self) -> int:
        """IR sequence length: one spectrum token + conditioning (ref: 66/130)."""
        return 1 + self.cond_len

    @property
    def cosy_blank_len(self) -> int:
        return 65 if self.parity_cosy_blank_65 else self.nmr_seq_len

    def modality_lengths(self, cosy_active: bool = True) -> tuple[int, ...]:
        """Sequence length contributed by each of the 5 modalities to the
        fused memory, in order (1H, 13C, HSQC, COSY, IR)."""
        n = self.nmr_seq_len
        cosy = n if cosy_active else self.cosy_blank_len
        return (n, n, n, cosy, self.ir_seq_len)

    def fused_len(self, cosy_active: bool = True) -> int:
        return sum(self.modality_lengths(cosy_active))


@dataclass(frozen=True)
class DataConfig:
    """Data pipeline configuration (reference: `dataloaders_pl_v15_4.py`)."""

    csv_1h_path: str = ""
    csv_13c_path: str = ""
    csv_hsqc_path: str = ""
    csv_cosy_path: str = ""
    ir_data_folder: str = ""
    pickle_path: str = ""

    batch_size: int = 64
    train_test_split: float = 0.9  # tr_te_split
    blank_percentage: float = 0.0
    smiles_randomizer: bool = False
    isomeric_smiles: bool = False
    data_size: int = 0  # 0 = all
    seed: int = 0


@dataclass(frozen=True)
class TrainConfig:
    """Training-loop configuration (reference: `MT_functions_v15_4.py`,
    `models_MMT_v15_4.py:1213-1220`)."""

    learning_rate: float = 1e-4  # lr_pretraining; 5e-5 for fine-tuning
    weight_decay: float = 1e-3
    num_epochs: int = 10
    plateau_factor: float = 0.5
    plateau_patience: int = 2

    weight_smi: float = 1.0
    weight_fp: float = 0.0
    weight_mw: float = 0.0
    weight_sgnn: float = 0.0
    weight_tanimoto: float = 0.0
    weight_validity: float = 0.0
    change_loss_weights: bool = False
    batch_frequency: int = 10_000
    increment: float = 0.01
    train_weight_min: float | None = None
    train_weight_max: float | None = None

    gen_smi_sequence: bool = False  # in-training sequence generation metrics
    sgnn_feedback: bool = False

    # device-side per-sample modality blanking probability (reference
    # blank_percentage applied as a jitted batch transform instead of
    # stochastic host featurization — keeps the HBM-resident dataset path;
    # train/step.blank_modalities_device)
    blank_percentage: float = 0.0

    # device-side per-peak ppm jitter (sim2real domain randomization for
    # simulator disagreement; train/step.jitter_spectra_device). 0 = off.
    jitter_1h_ppm: float = 0.0
    jitter_13c_ppm: float = 0.0
    jitter_gate_p: float = 0.5  # fraction of samples jittered per batch

    # device-side smooth per-sample ppm-AXIS warp, applied consistently
    # across modalities (structured sim2real randomization — models a
    # *different simulator*, which moves environments coherently rather
    # than per-peak; train/step.warp_spectra_device). 0 = off.
    warp_1h_ppm: float = 0.0
    warp_13c_ppm: float = 0.0

    # two-pass scheduled sampling (exposure-bias mitigation): with
    # probability ss_prob (linearly ramped over ss_ramp_steps) each non-pad
    # decoder-input token is replaced by the model's OWN sampled prediction
    # from a first, gradient-stopped teacher-forced pass; the loss is
    # computed on a second pass over the mixed inputs. Parallel two-pass
    # formulation (Mihaylova & Martins 2019) rather than the reference's
    # sequential in-training generation hook
    # (`models_MMT_v15_4.py:1222-1297`) — one extra decoder GEMM pass
    # instead of max_len sequential steps. 0 = off (single-pass parity).
    ss_prob: float = 0.0
    ss_ramp_steps: int = 2000

    checkpoint_dir: str = "checkpoints"
    save_interval_steps: int = 1000
    keep_checkpoints: int = 3

    # real-data fine-tuning freeze (reference use_real_data,
    # `MT_functions_v15_4.py:124-133`): path substrings of the ONLY
    # trainable params; () = train everything
    trainable_only: tuple = ()

    # mesh axes
    data_parallel: int = -1  # -1 = all devices
    model_parallel: int = 1

    # mixed precision: run forward/backward in bfloat16 (params cast at the
    # loss boundary; master params, loss, grads, and optimizer state stay
    # fp32). TPU-idiomatic — the MXU natively consumes bf16 operands.
    mixed_precision: bool = False

    # Generate dropout masks with the TPU's hardware RNG (jax 'unsafe_rbg'
    # impl) instead of counter-based threefry. Dropout on attention weights
    # draws O(B*H*S^2) random bits per layer; threefry generates them on the
    # VPU at ~10 ops/element and dominates the train step (measured: 268 ms
    # -> 158 ms at batch 64 bf16). Deterministic for a fixed backend,
    # sharding, and XLA version — but JAX does NOT guarantee rbg bit
    # stability across shardings/topologies/compiler upgrades, so set False
    # when bit-exact reproducibility across those is required. Statistical
    # quality is more than sufficient for dropout noise.
    fast_dropout_rng: bool = True


@dataclass(frozen=True)
class DecodeConfig:
    """Generation configuration (reference: `validate_generate_MMT_v15_4.py`,
    `mmt_result_test_functions_15_4.py`)."""

    max_len: int = 128
    temperature: float = 1.0
    beam_size: int = 5
    fanout: int = 128  # candidates sampled per molecule (ref duplicate_dict n=128)
    multinom_runs: int = 10  # unique valid SMILES wanted per molecule
    max_temp_rounds: int = 20  # temperature escalation cap (+0.1/round)
    temp_increment: float = 0.1
    mw_filter: bool = True
    mw_delta: float = 0.5  # +- window on rounded MW
    # also add the top-K beam hypotheses to each molecule's candidate pool
    # (beyond the reference's multinomial-only protocol — default off so the
    # MNS numbers stay comparable; one extra beam decode per batch when on)
    beam_candidates: int = 0
    # also merge the greedy hypothesis into the candidate pool — the
    # reference's sampling_method="mix" (models_MMT_v15_4.py:1222-1297
    # samples greedy AND multinomial inside training); default off so the
    # MNS numbers stay comparable to its multinomial-only sweep protocol
    greedy_in_pool: bool = False
    # decoder compute dtype for generation ("bfloat16" halves the dominant
    # HBM streams; token selection math stays fp32). None = memory dtype.
    compute_dtype: Optional[str] = None
    # dispatch sampling round k+1 before round k's host-side filtering:
    # overlaps device decode with host chemistry (see
    # eval.generation.generate_candidates_batch for why this is lossless)
    lookahead: bool = True
    # after round 0, regather only the still-unsatisfied molecules into a
    # half/quarter-width compiled round (3 static widths total): escalation
    # rounds are batch-synchronized, and on a trained model ~45% of
    # molecules need round 1 and ~11% run all rounds — full-width rounds
    # paid the whole fan-out decode for lanes whose results were discarded.
    # Auto-disabled when the encoder memory is sharded over >1 device (the
    # narrow gather would fight the GSPMD batch partitioning).
    round_shrink: bool = True
    # decode-length banding: when the evaluation targets are known, quantize
    # the decode length to the smallest of {40, 56, max_len} that covers the
    # batch's longest target plus a 12-token margin. Decode cost is linear
    # in the sequential while_loop trip count (the roofline's residual
    # bound), so a light-molecule batch pays 40 steps instead of 64.
    # Candidates longer than target+12 would be MW-filtered rejects anyway;
    # executable count stays bounded (<=3 lengths x <=4 shrink widths).
    # Default OFF (r4 advisor): setting decode length from ground-truth
    # target lengths is information the reference pipeline doesn't use —
    # headline accuracy/bench numbers must not depend on it. Opt in for
    # exploratory sweeps via --band-max-len / DecodeConfig(band_max_len=True).
    band_max_len: bool = False


@dataclass(frozen=True)
class MMTConfig:
    """Top-level bundle."""

    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    decode: DecodeConfig = dataclasses.field(default_factory=DecodeConfig)

    def replace(self, **kw: Any) -> "MMTConfig":
        return dataclasses.replace(self, **kw)


def from_reference_json(path_or_dict: str | Mapping[str, Any]) -> MMTConfig:
    """Build an MMTConfig from a reference-style flat config JSON
    (dict of singleton lists, `config_V8.json`). Only fields that map onto
    the new typed config are consumed; everything else is ignored.
    """
    if isinstance(path_or_dict, str):
        with open(path_or_dict) as f:
            raw = json.load(f)
    else:
        raw = dict(path_or_dict)
    flat = {k: (v[0] if isinstance(v, Sequence) and not isinstance(v, str) and len(v) == 1 else v) for k, v in raw.items()}

    modalities = ModalityConfig.from_training_mode(flat.get("training_mode", "1H_13C_HSQC_COSY_IR_MF_MW"))
    model = ModelConfig(
        hidden_size=int(flat.get("hidden_size", 128)),
        num_heads=int(flat.get("num_heads", 16)),
        cross_num_heads=int(flat.get("num_heads", 16)) // 4,
        num_encoder_layers=int(flat.get("num_encoder_layers", 6)),
        num_decoder_layers=int(flat.get("num_decoder_layers", 6)),
        dropout=float(flat.get("drop_out", 0.1)),
        smiles_vocab_size=int(flat.get("in_size", 43)),
        mf_vocab_size=int(flat.get("MF_vocab_size", 212)),
        fingerprint_size=int(flat.get("fingerprint_size", 512)),
        max_len=int(flat.get("max_len", 128)),
        spectrum_points=int(flat.get("padding_points_number", 64)),
        ir_bins=int(flat.get("input_dim_IR", 1000)),
        modalities=modalities,
        use_real_data=bool(flat.get("use_real_data", False)),
    )
    data = DataConfig(
        csv_1h_path=str(flat.get("csv_1H_path_SGNN", "")),
        csv_13c_path=str(flat.get("csv_13C_path_SGNN", "")),
        csv_hsqc_path=str(flat.get("csv_HSQC_path_SGNN", "")),
        csv_cosy_path=str(flat.get("csv_COSY_path_SGNN", "")),
        ir_data_folder=str(flat.get("IR_data_folder", "")),
        batch_size=int(flat.get("batch_size", 64)),
        train_test_split=float(flat.get("tr_te_split", 0.9)),
        blank_percentage=float(flat.get("blank_percentage", 0.0)),
        smiles_randomizer=bool(flat.get("smi_randomizer", False)),
        isomeric_smiles=bool(flat.get("isomericSmiles", False)),
        data_size=int(flat.get("data_size", 0) or 0),
    )
    train = TrainConfig(
        learning_rate=float(flat.get("lr_pretraining", 1e-4)),
        weight_decay=float(flat.get("weight_decay", 1e-3)),
        num_epochs=int(flat.get("num_epochs", 10)),
        weight_smi=float(flat.get("weight_SMI", 1.0)),
        weight_fp=float(flat.get("weight_FP", 0.0)),
        weight_mw=float(flat.get("weight_MW", 0.0)),
        weight_sgnn=float(flat.get("weight_sgnn", 0.0)),
        weight_tanimoto=float(flat.get("weight_tanimoto", 0.0)),
        weight_validity=float(flat.get("weight_validity", 0.0)),
        change_loss_weights=bool(flat.get("change_loss_weights", False)),
        batch_frequency=int(flat.get("batch_frequency", 10_000)),
        increment=float(flat.get("increment", 0.01)),
        gen_smi_sequence=bool(flat.get("gen_SMI_sequence", False)),
        sgnn_feedback=bool(flat.get("sgnn_feedback", False)),
        checkpoint_dir=str(flat.get("model_save_dir", "checkpoints")),
    )
    decode = DecodeConfig(
        max_len=int(flat.get("max_len", 128)),
        temperature=float(flat.get("temperature", 1.0)),
        beam_size=int(flat.get("beam_size", 5)),
        multinom_runs=int(flat.get("multinom_runs", 10)),
    )
    return MMTConfig(model=model, data=data, train=train, decode=decode)
