"""End-to-end decode-loop parity against reference-semantics torch oracles.

Block-level parity (test_layers_torch_parity.py) proves each transformer
block matches torch.nn; this file closes the loop the BASELINE.md clause
asks for: same weights, same inputs -> token-identical GREEDY and BEAM
decodes between the compiled KV-cached JAX samplers and torch oracles that
re-implement the reference's decode loops with verbatim semantics:

- greedy: full-prefix decoder re-run per token, argmax over
  temperature-softmax, early exit when every lane emits <PAD>=0
  (`mmt_result_test_functions_15_4.py:984-1032` greedy_sequence_2 — the
  eval variant without dropout).
- beam: per-sample python beam with (score, sequence) tuples,
  multiplicative probability scores, EOS-frozen beams, seen-set dedup,
  top-k by score (`validate_generate_MMT_v15_4.py:995-1094`).

The oracle model is assembled from STOCK torch.nn modules with the same
constructor calls as the reference (`models_MMT_v15_4.py:505-545`) and
loaded from the JAX pytree via models.convert.to_torch_state_dict — no
reference code is copied.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodalspectraltransformer_tpu.decode import samplers  # noqa: E402
from multimodalspectraltransformer_tpu.models import convert, mmt  # noqa: E402
from multimodalspectraltransformer_tpu.utils.config import ModelConfig  # noqa: E402

PAD, EOS, SOS = 0, 2, 3


def _small_cfg() -> ModelConfig:
    return ModelConfig(num_encoder_layers=2, num_decoder_layers=2, ffn_dim=256)


class TorchDecodeOracle(torch.nn.Module):
    """Decoder half of the reference model from stock torch modules
    (`models_MMT_v15_4.py:505-506,539-545`)."""

    def __init__(self, cfg: ModelConfig, pe_len: int):
        super().__init__()
        d = cfg.hidden_size
        self.embed_trg = torch.nn.Embedding(cfg.smiles_vocab_size, d)
        self.pe_trg = torch.nn.Embedding(pe_len, d)
        layer = torch.nn.TransformerDecoderLayer(
            d, cfg.num_heads, dim_feedforward=cfg.ffn_dim
        )
        self.decoder = torch.nn.TransformerDecoder(layer, cfg.num_decoder_layers)
        self.fc_out = torch.nn.Linear(d, cfg.smiles_vocab_size)

    @staticmethod
    def generate_square_subsequent_mask(n: int) -> torch.Tensor:
        # reference `models_MMT_v15_4.py:794-800`: additive -inf causal mask
        return torch.triu(torch.full((n, n), float("-inf")), diagonal=1)

    def decode_logits(self, seq: torch.Tensor, memory: torch.Tensor, kpm):
        """seq [T, N] -> logits [T, N, V] (full-prefix re-run)."""
        t, n = seq.shape
        pos = torch.arange(t).unsqueeze(1).expand(t, n)
        emb = self.embed_trg(seq) + self.pe_trg(pos)
        mask = self.generate_square_subsequent_mask(t)
        out = self.decoder(emb, memory, tgt_mask=mask, memory_key_padding_mask=kpm)
        return self.fc_out(out)


def _build_pair(seed: int = 0, batch: int = 3, src: int = 20):
    """(jax params, torch oracle, jax memory/kpm, torch memory/kpm)."""
    cfg = _small_cfg()
    params = mmt.init_params(cfg, jax.random.PRNGKey(seed), batch_size=2)
    sd = convert.to_torch_state_dict(cfg, params)

    pe_len = np.asarray(params["pe_trg"]["embedding"]).shape[0]
    oracle = TorchDecodeOracle(cfg, pe_len).eval()
    oracle_sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in sd.items()
        if k.split(".")[0] in ("embed_trg", "pe_trg", "decoder", "fc_out")
    }
    missing, unexpected = oracle.load_state_dict(oracle_sd, strict=True), None
    del missing, unexpected

    rng = np.random.default_rng(seed + 1)
    memory = rng.standard_normal((batch, src, cfg.hidden_size)).astype(np.float32)
    kpm = np.zeros((batch, src), bool)
    kpm[0, 15:] = True
    kpm[2, 10:] = True

    t_mem = torch.from_numpy(memory).transpose(0, 1)  # [S, N, D] seq-first
    t_kpm = torch.from_numpy(kpm)
    return cfg, params, oracle, jnp.asarray(memory), jnp.asarray(kpm), t_mem, t_kpm


# ---------------------------------------------------------------------------
# reference-semantics loops (verbatim behavior, reimplemented)
# ---------------------------------------------------------------------------

def oracle_greedy(oracle, memory, kpm, max_len: int, temperature: float = 1.0):
    """greedy_sequence_2 semantics; returns tokens [N, T] (no <SOS>)."""
    n = memory.size(1)
    seq = torch.full((1, n), SOS, dtype=torch.long)
    with torch.no_grad():
        for _ in range(max_len):
            logits = oracle.decode_logits(seq, memory, kpm)
            probs = torch.softmax(logits / temperature, dim=2)
            nxt = torch.argmax(probs[-1], dim=1)
            seq = torch.cat((seq, nxt.unsqueeze(0)), dim=0)
            if (nxt == 0).all():
                break
    return seq[1:].transpose(0, 1)  # [N, T]


def oracle_beam(oracle, memory, kpm, max_len: int, beam_size: int, temperature: float = 1.0):
    """beam_search/beam_search_step semantics; per sample, returns the
    beam list sorted best-first: [(score, seq-no-sos), ...]."""
    n = memory.size(1)
    results = []
    with torch.no_grad():
        for i in range(n):
            mem_i = memory[:, i : i + 1, :]
            kpm_i = kpm[i : i + 1]
            beam = [(1.0, [SOS], [])]
            for _ in range(max_len):
                new_beam = []
                seen = set()
                for score, sequence, probs_acc in beam:
                    tup = tuple(sequence)
                    if tup in seen:
                        continue
                    seen.add(tup)
                    if sequence[-1] == EOS:
                        new_beam.append((score, sequence, probs_acc))
                        continue
                    trg = torch.tensor(sequence, dtype=torch.long).unsqueeze(1)
                    logits = oracle.decode_logits(trg, mem_i, kpm_i)
                    probs = torch.softmax(logits[-1, 0] / temperature, dim=-1)
                    top_probs, top_idx = torch.topk(probs, beam_size)
                    for k in range(beam_size):
                        cand = sequence + [int(top_idx[k])]
                        if tuple(cand) in seen:
                            continue
                        seen.add(tuple(cand))
                        new_beam.append(
                            (score * float(top_probs[k]), cand, probs_acc + [float(top_probs[k])])
                        )
                new_beam.sort(key=lambda x: x[0], reverse=True)
                beam = new_beam[:beam_size]
            results.append([(s, seq[1:], probs) for s, seq, probs in beam])
    return results


# ---------------------------------------------------------------------------
# parity tests
# ---------------------------------------------------------------------------

def _trim(tokens) -> list[list[int]]:
    """Cut each row after the first terminal token (<EOS> or <PAD>,
    inclusive). The reference loops keep decoding PAST terminals (greedy
    until all-PAD, beam through <PAD> tokens — only <EOS> freezes a beam,
    `validate_generate_MMT_v15_4.py:1020-1022`) while our samplers stop a
    lane at its first terminal; SMILES conversion cuts there on both
    sides, so the decoded strings agree exactly on this region."""
    out = []
    for row in tokens:
        row = list(map(int, row))
        cut = min(
            (row.index(t) for t in (EOS, PAD) if t in row), default=len(row)
        )
        out.append(row[: cut + 1] if cut < len(row) else row)
    return out


def test_greedy_decode_matches_reference_loop():
    cfg, params, oracle, j_mem, j_kpm, t_mem, t_kpm = _build_pair(seed=0)
    max_len = 24
    res = samplers.greedy_decode(params, cfg, j_mem, j_kpm, 1.0, max_len)
    ours = _trim(np.asarray(res.tokens))
    ref = _trim(oracle_greedy(oracle, t_mem, t_kpm, max_len).numpy())
    assert ours == ref


def test_greedy_decode_matches_reference_loop_other_seed():
    cfg, params, oracle, j_mem, j_kpm, t_mem, t_kpm = _build_pair(seed=7, batch=4, src=17)
    max_len = 20
    res = samplers.greedy_decode(params, cfg, j_mem, j_kpm, 1.0, max_len)
    ours = _trim(np.asarray(res.tokens))
    ref = _trim(oracle_greedy(oracle, t_mem, t_kpm, max_len).numpy())
    assert ours == ref


def test_beam_decode_matches_reference_loop():
    cfg, params, oracle, j_mem, j_kpm, t_mem, t_kpm = _build_pair(seed=1)
    max_len, k = 16, 3
    res = samplers.beam_search(params, cfg, j_mem, j_kpm, beam_size=k, max_len=max_len)
    ref = oracle_beam(oracle, t_mem, t_kpm, max_len, k)
    tokens = np.asarray(res.tokens)  # [B, K, T] best-first
    scores = np.asarray(res.scores)
    for b in range(tokens.shape[0]):
        ours_b = _trim(tokens[b])
        ref_b = [_trim([seq])[0] if len(seq) else [] for _, seq, _ in ref[b]]
        # top-1 must be token-identical on the decoded region
        assert ours_b[0] == ref_b[0], (b, ours_b[0], ref_b[0])
        # the full top-k SETS must agree (ties may reorder within equal scores)
        assert {tuple(s) for s in ours_b} == {tuple(s) for s in ref_b}, b
        # our top-1 log-prob score == log of the reference's multiplicative
        # score over the same emitted region (the reference keeps
        # multiplying past terminals; compare the partial product)
        n_emitted = len(ours_b[0])
        ref_partial = float(np.prod(ref[b][0][2][:n_emitted]))
        np.testing.assert_allclose(np.exp(scores[b][0]), ref_partial, rtol=1e-3)
