"""Utilization accounting for the headline numbers (VERDICT r2 weak #6).

Every perf claim in BENCH/README was a ratio to the reference V100's wall
clock; this script states what fraction of the TPU's own peak each headline
stage achieves and which resource bounds it, so "actually fast" is checkable
against the hardware rather than against a 2018 GPU.

Analytic FLOP counts are derived from ModelConfig (2 FLOPs per MAC); the
bandwidth model charges each stage its parameter bytes + KV-cache traffic +
activation traffic at the compute dtype. Peaks are TPU v5e (v5 lite):
197 TFLOP/s bf16 / 98.5 TFLOP/s fp32, 819 GB/s HBM.

Usage:
  python scripts/roofline.py                 # analytic, with recorded times
  python scripts/roofline.py --train-ms 158 --decode-ms 280
Reference basis being contextualized: train_step 158 ms @ B=64 bf16,
MNS fan-out round (6144 lanes) 220-310 ms device (CLAUDE.md measurements).
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

from multimodalspectraltransformer_tpu.utils.config import ModelConfig

V5E_BF16_PEAK = 197e12  # FLOP/s
V5E_FP32_PEAK = 98.5e12
V5E_HBM_BW = 819e9  # bytes/s


def encoder_layer_flops(S: int, d: int, f: int) -> float:
    """One post-norm transformer encoder layer, fwd: QKV+out projections,
    scores+apply, two FFN matmuls. 2 FLOPs/MAC."""
    proj = 8 * S * d * d
    attn = 4 * S * S * d
    ffn = 4 * S * d * f
    return float(proj + attn + ffn)


def decoder_layer_flops(T: int, S_mem: int, d: int, f: int,
                        include_cross_kv: bool = True) -> float:
    """One decoder layer, fwd, full-sequence (training) shape: self-attn over
    T, cross-attn over S_mem, FFN. Cross K/V projection of the memory is
    charged once per layer (shared across beam/fan-out lanes at inference —
    pass include_cross_kv=False there and charge it separately)."""
    self_proj = 8 * T * d * d
    self_attn = 4 * T * T * d
    cross_q_out = 4 * T * d * d
    cross_kv = 4 * S_mem * d * d if include_cross_kv else 0
    cross_attn = 4 * T * S_mem * d
    ffn = 4 * T * d * f
    return float(self_proj + self_attn + cross_q_out + cross_kv + cross_attn + ffn)


def model_shapes(cfg: ModelConfig):
    nmr = cfg.nmr_seq_len  # 129 default
    ir = cfg.ir_seq_len  # 66
    fused = 4 * nmr + ir  # 582 (all modalities on, no parity blank)
    return nmr, ir, fused


def forward_flops_per_sample(cfg: ModelConfig, T: int = 63) -> float:
    d, f = cfg.hidden_size, cfg.ffn_dim
    nmr, ir, fused = model_shapes(cfg)
    enc = cfg.num_encoder_layers * (
        4 * encoder_layer_flops(nmr, d, f) + encoder_layer_flops(ir, d, f)
    )
    fusion = cfg.num_encoder_layers * encoder_layer_flops(fused, d, f)
    dec = cfg.num_decoder_layers * decoder_layer_flops(T, fused, d, f)
    head = 2 * T * d * cfg.smiles_vocab_size + 2 * d * cfg.fingerprint_size
    return enc + fusion + dec + head


def param_count(cfg: ModelConfig) -> float:
    d, f = cfg.hidden_size, cfg.ffn_dim
    enc_layer = 4 * d * d + 2 * d * f + 4 * d  # attn + ffn (+ LN, biases approx)
    dec_layer = 4 * d * d + 4 * d * d + 2 * d * f + 6 * d  # self + cross + ffn
    n_enc = 5 * cfg.num_encoder_layers + cfg.num_encoder_layers  # modality + fusion
    return float(n_enc * enc_layer + cfg.num_decoder_layers * dec_layer
                 + cfg.smiles_vocab_size * d + cfg.max_len * d
                 + d * cfg.fingerprint_size + cfg.ir_bins * d)


def decode_step_flops_per_lane(cfg: ModelConfig, t: int, S_mem: int) -> float:
    """One incremental token for one lane with a KV cache at length t:
    projections for the new token + attention against the cache + cross-attn
    against the (shared, precomputed) memory + FFN."""
    d, f = cfg.hidden_size, cfg.ffn_dim
    L = cfg.num_decoder_layers
    proj = 8 * d * d + 4 * d * d  # self QKV+out, cross Q+out
    self_attn = 4 * t * d
    cross_attn = 4 * S_mem * d
    ffn = 4 * d * f
    head = 2 * d * cfg.smiles_vocab_size
    return float(L * (proj + self_attn + cross_attn + ffn) + head)


def fmt(x: float) -> str:
    for unit, div in (("T", 1e12), ("G", 1e9), ("M", 1e6)):
        if x >= div:
            return f"{x / div:.2f} {unit}"
    return f"{x:.0f} "


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-ms", type=float, default=158.0,
                    help="measured train_step wall ms (B=64 bf16 default)")
    ap.add_argument("--train-batch", type=int, default=64)
    ap.add_argument("--decode-ms", type=float, default=265.0,
                    help="measured MNS fan-out round ms (24 mols * 128 fanout)")
    ap.add_argument("--decode-lanes", type=int, default=24 * 128)
    ap.add_argument("--decode-mols", type=int, default=24)
    ap.add_argument("--decode-len", type=int, default=128)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    cfg = ModelConfig(dtype="bfloat16")
    bytes_per = 2  # bf16

    # ---- train step: fwd + bwd ~= 3x fwd FLOPs -----------------------------
    fwd = forward_flops_per_sample(cfg)
    train_flops = 3 * fwd * args.train_batch
    train_achieved = train_flops / (args.train_ms / 1e3)
    train_mfu = train_achieved / V5E_BF16_PEAK
    params = param_count(cfg)
    # bandwidth: params read fwd + read bwd + grads written + optimizer state
    # touched (m, v read+write, params written) ~= 8x param bytes, fp32 opt
    train_bytes = params * (2 * bytes_per + 6 * 4)
    train_bw = train_bytes / (args.train_ms / 1e3)

    # ---- MNS decode round: decode-len incremental steps over all lanes ----
    nmr, ir, fused = model_shapes(cfg)
    per_tok = sum(
        decode_step_flops_per_lane(cfg, t, fused) for t in range(args.decode_len)
    ) / args.decode_len
    dec_flops = per_tok * args.decode_len * args.decode_lanes
    dec_achieved = dec_flops / (args.decode_ms / 1e3)
    dec_mfu = dec_achieved / V5E_BF16_PEAK
    # bandwidth: per token step, every lane re-reads its merged KV cache
    # [H, 2Dh, T] plus the decoder weights once per step (amortized over
    # lanes) plus the shared cross-KV memory once per step
    d = cfg.hidden_size
    L = cfg.num_decoder_layers
    kv_bytes_per_lane_tok = L * 2 * d * (args.decode_len / 2) * bytes_per
    dec_params = L * (8 * d * d + 2 * d * cfg.ffn_dim)
    total_bytes = args.decode_len * (
        args.decode_lanes * kv_bytes_per_lane_tok  # every step re-reads each cache
        + dec_params * bytes_per  # weights, amortized over lanes per step
        + args.decode_mols * fused * 2 * d * bytes_per  # shared cross-KV memory
    )
    dec_bw = total_bytes / (args.decode_ms / 1e3)

    rows = {
        "model_params": params,
        "train_step": {
            "batch": args.train_batch, "ms": args.train_ms,
            "flops": train_flops, "achieved_flops_per_s": train_achieved,
            "mfu_vs_bf16_peak": train_mfu,
            "hbm_bytes_modeled": train_bytes,
            "hbm_gbps_modeled": train_bw / 1e9,
            "bound": "latency/occupancy (tiny matmuls: d_model=128, head_dim=8 "
                     "under-fill the 128x128 MXU; neither FLOP nor HBM peak is "
                     "approached — see README roofline note)",
        },
        "mns_decode_round": {
            "lanes": args.decode_lanes, "ms": args.decode_ms,
            "flops": dec_flops, "achieved_flops_per_s": dec_achieved,
            "mfu_vs_bf16_peak": dec_mfu,
            "hbm_gbps_modeled": dec_bw / 1e9,
            "hbm_util_modeled": dec_bw / V5E_HBM_BW,
            "bound": "mixed HBM bandwidth + sequential latency (the KV-cache "
                     "re-read is ~1/3 of HBM peak and dominates modeled "
                     "traffic — the merged sequence-minor [B,H,2Dh,S] layout "
                     "exists to keep those bytes minimal; the rest of the gap "
                     "is 128 dependent ~2 ms token steps whose matmuls "
                     "under-fill the MXU at d_model=128)",
        },
    }
    if args.json:
        print(json.dumps(rows))
        return 0
    print(f"model params (analytic): {fmt(params)} ({fmt(params * 2)}B bf16)")
    t = rows["train_step"]
    print(f"\ntrain_step B={t['batch']} @ {t['ms']:.0f} ms:")
    print(f"  {fmt(t['flops'])}FLOP -> {fmt(t['achieved_flops_per_s'])}FLOP/s "
          f"= {t['mfu_vs_bf16_peak'] * 100:.1f}% of v5e bf16 peak")
    print(f"  modeled HBM traffic {t['hbm_gbps_modeled']:.1f} GB/s "
          f"({t['hbm_gbps_modeled'] / (V5E_HBM_BW / 1e9) * 100:.1f}% of peak)")
    print(f"  bound: {t['bound']}")
    m = rows["mns_decode_round"]
    print(f"\nMNS decode round, {m['lanes']} lanes @ {m['ms']:.0f} ms:")
    print(f"  {fmt(m['flops'])}FLOP -> {fmt(m['achieved_flops_per_s'])}FLOP/s "
          f"= {m['mfu_vs_bf16_peak'] * 100:.1f}% of v5e bf16 peak")
    print(f"  modeled HBM traffic {m['hbm_gbps_modeled']:.1f} GB/s "
          f"({m['hbm_util_modeled'] * 100:.1f}% of peak)")
    print(f"  bound: {m['bound']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
