"""The Multimodal Spectral Transformer (MMT) in JAX/flax, TPU-first.

Functional equivalent of the reference ``MultimodalTransformer``
(`/root/reference/utils_MMT/models_MMT_v15_4.py:487-976`): five per-modality
transformer encoders (1H, 13C, HSQC, COSY, IR) each consuming
``[spectrum | MF | (MS) | MW]`` token sequences, a cross-modal fusion
encoder over the concatenated memories, a mean-pooled fingerprint head, and
an autoregressive SMILES decoder with learned positional embeddings.

TPU-first redesign (not a port):

- **Batch-first static shapes.** Sequence layout is a compile-time constant
  table (129/129/129/129/66 tokens by default; 193/130 with the MS hint).
- **Stacked modality encoders.** The five encoders share an architecture and
  differ only in weights, so their parameters are stacked on a leading
  modality axis and executed with a single ``nn.vmap``-ed encoder: every
  matmul becomes one large batched GEMM ``[5, B*S, 128] x [5, 128, 2048]``
  that tiles cleanly onto the MXU instead of five small kernel launches.
  The IR sequence (66 tokens) is padded to the NMR length inside the stack
  and sliced back out afterwards — masked self-attention makes the padding
  mathematically inert.
- **Inactive modalities** (not part of ``config.modalities``) still produce
  their zero-memory / blank-mask blocks in the fused sequence, exactly like
  the reference's blank-substitution branches (`models_MMT_v15_4.py:850-939`)
  including, behind ``parity_cosy_blank_65``, the reference's 65-token
  blank-COSY quirk (`:912-914`) and the attended-zeros blank-IR mask quirk
  (`:935`).

Per-sample modality blanking (``blank_percentage``) is a *data* operation:
blanked samples arrive with zeroed spectra and all-pad masks, and their
encoder block still attends to MF/MW — identical to the reference dataloader
semantics (`dataloaders_pl_v15_4.py:468-476`).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.config import ModelConfig
from .layers import TransformerDecoder, TransformerEncoder, causal_mask

Array = jax.Array

MODALITY_ORDER: tuple[str, ...] = ("1H", "13C", "HSQC", "COSY", "IR")


class MMTBatch(NamedTuple):
    """One batch of model inputs. Masks use the reference convention:
    1/True = padding (masked out), 0/False = real data."""

    src_1h: Array  # [B, P, 2] (shift/10, intensity)
    mask_1h: Array  # [B, P]
    src_13c: Array  # [B, P] (shift/200)
    mask_13c: Array  # [B, P]
    src_hsqc: Array  # [B, P, 2] (H/10, C/200)
    mask_hsqc: Array  # [B, P]
    src_cosy: Array  # [B, P, 2] (H/10, H/10)
    mask_cosy: Array  # [B, P]
    src_ir: Array  # [B, ir_bins]
    src_mf: Array  # [B, mf_len] int ids
    mask_mf: Array  # [B, mf_len]
    src_ms: Array  # [B, ms_len] int ids (SMILES-hint; zeros when unused)
    mask_ms: Array  # [B, ms_len]
    mw: Array  # [B] float exact molecular weight

    @property
    def batch_size(self) -> int:
        return self.src_1h.shape[0]


class EncoderOutput(NamedTuple):
    memory: Array  # [B, S_fused, D]
    memory_key_padding_mask: Array  # [B, S_fused] bool, True = masked
    fingerprint: Array  # [B, fingerprint_size]


def dummy_batch(cfg: ModelConfig, batch_size: int = 2, dtype=jnp.float32) -> MMTBatch:
    """An all-zeros, correctly-shaped batch (for init / compile checks)."""
    P = cfg.spectrum_points
    z = lambda *s: jnp.zeros(s, dtype=dtype)
    zi = lambda *s: jnp.zeros(s, dtype=jnp.int32)
    return MMTBatch(
        src_1h=z(batch_size, P, 2), mask_1h=zi(batch_size, P),
        src_13c=z(batch_size, P), mask_13c=zi(batch_size, P),
        src_hsqc=z(batch_size, P, 2), mask_hsqc=zi(batch_size, P),
        src_cosy=z(batch_size, P, 2), mask_cosy=zi(batch_size, P),
        src_ir=z(batch_size, cfg.ir_bins),
        src_mf=zi(batch_size, cfg.mf_len), mask_mf=zi(batch_size, cfg.mf_len),
        src_ms=zi(batch_size, cfg.ms_len), mask_ms=zi(batch_size, cfg.ms_len),
        mw=z(batch_size),
    )


class MultimodalTransformer(nn.Module):
    """Five modality encoders + fusion encoder + SMILES decoder."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        d = cfg.hidden_size
        dt = jnp.dtype(cfg.dtype)
        self._dtype = dt

        # Point/spectrum embeddings (reference `models_MMT_v15_4.py:358-502`).
        self.embed_1h = nn.Dense(d, dtype=dt, name="embed_1h")
        self.embed_13c = nn.Dense(d, dtype=dt, name="embed_13c")
        self.embed_hsqc = nn.Dense(d, dtype=dt, name="embed_hsqc")
        self.embed_cosy = nn.Dense(d, dtype=dt, name="embed_cosy")
        self.embed_ir = nn.Dense(d, dtype=dt, name="embed_ir")
        # +1 slot: the reference sizes this table at mf_vocab_size although
        # its own vocab can emit id == mf_vocab_size (latent overflow bug,
        # `models_MMT_v15_4.py:449`); the extra row is zero after conversion.
        self.embed_mf = nn.Embed(cfg.mf_vocab_size + 1, d, dtype=dt, name="embed_mf")
        self.embed_ms = nn.Embed(cfg.smiles_vocab_size, d, dtype=dt, name="embed_ms")
        self.embed_mw = nn.Dense(d, dtype=dt, name="embed_mw")

        # Target embeddings.
        self.embed_trg = nn.Embed(cfg.smiles_vocab_size, d, dtype=dt, name="embed_trg")
        self.pe_trg = nn.Embed(cfg.max_len, d, dtype=dt, name="pe_trg")
        self.dropout_trg = nn.Dropout(rate=cfg.dropout)

        # Five per-modality encoders, stacked on a leading modality axis and
        # driven by one vmapped module so the MXU sees batched GEMMs.
        stacked = nn.vmap(
            TransformerEncoder,
            in_axes=(0, 0, None, None),
            out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
        )
        self.modality_encoders = stacked(
            num_layers=cfg.num_encoder_layers,
            d_model=d,
            num_heads=cfg.num_heads,
            ffn_dim=cfg.ffn_dim,
            dropout=cfg.dropout,
            layer_norm_eps=cfg.layer_norm_eps,
            dtype=dt,
            remat=cfg.remat,
            name="modality_encoders",
        )

        self.encoder_cross = TransformerEncoder(
            num_layers=cfg.num_encoder_layers,
            d_model=d,
            num_heads=cfg.cross_num_heads,
            ffn_dim=cfg.ffn_dim,
            dropout=cfg.dropout,
            layer_norm_eps=cfg.layer_norm_eps,
            dtype=dt,
            remat=cfg.remat,
            name="encoder_cross",
        )

        self.decoder = TransformerDecoder(
            num_layers=cfg.num_decoder_layers,
            d_model=d,
            num_heads=cfg.num_heads,
            ffn_dim=cfg.ffn_dim,
            dropout=cfg.dropout,
            layer_norm_eps=cfg.layer_norm_eps,
            dtype=dt,
            remat=cfg.remat,
            name="decoder",
        )

        self.fp1 = nn.Dense(cfg.fingerprint_size, dtype=dt, name="fp1")
        self.fc_out = nn.Dense(cfg.smiles_vocab_size, dtype=dt, name="fc_out")
        self.real_data_linear = nn.Dense(cfg.smiles_vocab_size, dtype=dt, name="real_data_linear")

    # ------------------------------------------------------------------ utils

    def _cond_embeddings(self, batch: MMTBatch, deterministic: bool):
        """Embed the conditioning suffix [MF | MS | MW] shared by every
        modality sequence. Returns (emb [B, cond_len, D], mask [B, cond_len]).

        All three embeddings are computed unconditionally (their cost is
        negligible) so the parameter tree always contains every table, like
        the reference torch model which registers all submodules regardless
        of training_mode — this keeps checkpoints interchangeable across
        modality configurations.
        """
        cfg = self.cfg
        e_mf = jax.nn.relu(self.embed_mf(batch.src_mf))
        e_ms = jax.nn.relu(self.embed_ms(batch.src_ms))
        mw = batch.mw.astype(self._dtype)[:, None, None]  # [B,1,1]
        e_mw = jax.nn.relu(self.embed_mw(mw))  # [B,1,D]

        embs, masks = [], []
        if cfg.modalities.use_mf:
            embs.append(e_mf)
            masks.append(batch.mask_mf.astype(bool))
        if cfg.modalities.use_ms:
            embs.append(e_ms)
            masks.append(batch.mask_ms.astype(bool))
        if cfg.modalities.use_mw:
            embs.append(e_mw)
            masks.append(jnp.zeros((batch.batch_size, 1), dtype=bool))
        if not embs:
            B = batch.batch_size
            return jnp.zeros((B, 0, cfg.hidden_size), self._dtype), jnp.zeros((B, 0), bool)
        return jnp.concatenate(embs, axis=1), jnp.concatenate(masks, axis=1)

    # ---------------------------------------------------------------- encoder

    def encode(self, batch: MMTBatch, deterministic: bool = True) -> EncoderOutput:
        """Run the per-modality encoders + fusion encoder.

        Equivalent to the encoder half of the reference forward
        (`models_MMT_v15_4.py:803-948`) and of the out-of-class copy in
        `validate_generate_MMT_v15_4.py:95-267`.
        """
        cfg = self.cfg
        B = batch.batch_size
        D = cfg.hidden_size
        L = cfg.nmr_seq_len  # padded stack length for every lane

        cond_emb, cond_mask = self._cond_embeddings(batch, deterministic)

        # Per-modality spectrum embeddings -> [B, P(or 1), D]
        e1h = jax.nn.relu(self.embed_1h(batch.src_1h.astype(self._dtype)))
        e13c = jax.nn.relu(self.embed_13c(batch.src_13c.astype(self._dtype)[..., None]))
        ehsqc = jax.nn.relu(self.embed_hsqc(batch.src_hsqc.astype(self._dtype)))
        ecosy = jax.nn.relu(self.embed_cosy(batch.src_cosy.astype(self._dtype)))
        eir = jax.nn.relu(self.embed_ir(batch.src_ir.astype(self._dtype)))[:, None, :]  # [B,1,D]

        def lane(spec_emb: Array, spec_mask: Array) -> tuple[Array, Array]:
            """[spec | cond] padded to L. Returns (x [B,L,D], kpm [B,L])."""
            x = jnp.concatenate([spec_emb, cond_emb], axis=1)
            m = jnp.concatenate([spec_mask.astype(bool), cond_mask], axis=1)
            pad = L - x.shape[1]
            if pad > 0:
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
                m = jnp.pad(m, ((0, 0), (0, pad)), constant_values=True)
            return x, m

        x1h, m1h = lane(e1h, batch.mask_1h)
        x13c, m13c = lane(e13c, batch.mask_13c)
        xhsqc, mhsqc = lane(ehsqc, batch.mask_hsqc)
        xcosy, mcosy = lane(ecosy, batch.mask_cosy)
        # IR token is always attended (reference `_embed_spectrum_IR`, `:761-767`)
        xir, mir = lane(eir, jnp.zeros((B, 1), dtype=bool))

        xs = jnp.stack([x1h, x13c, xhsqc, xcosy, xir], axis=0)  # [5,B,L,D]
        ms = jnp.stack([m1h, m13c, mhsqc, mcosy, mir], axis=0)  # [5,B,L]

        mems = self.modality_encoders(xs, ms, None, deterministic)  # [5,B,L,D]

        # Assemble the fused sequence with per-modality true lengths and the
        # reference's blank-substitution rules for inactive modalities.
        active = {
            "1H": cfg.modalities.use_1h,
            "13C": cfg.modalities.use_13c,
            "HSQC": cfg.modalities.use_hsqc,
            "COSY": cfg.modalities.use_cosy,
            "IR": cfg.modalities.use_ir,
        }
        true_len = {"1H": L, "13C": L, "HSQC": L, "COSY": L, "IR": cfg.ir_seq_len}

        pieces, masks = [], []
        for idx, name in enumerate(MODALITY_ORDER):
            if active[name]:
                tl = true_len[name]
                pieces.append(mems[idx][:, :tl])
                masks.append(ms[idx][:, :tl])
            else:
                # Blank block: zero memory. NMR blanks are fully masked;
                # the IR blank is *attended* zeros (reference quirk, `:935`).
                if name == "IR":
                    bl = cfg.ir_seq_len
                    blank_mask = jnp.zeros((B, bl), dtype=bool)
                elif name == "COSY":
                    bl = cfg.cosy_blank_len
                    blank_mask = jnp.ones((B, bl), dtype=bool)
                else:
                    bl = L
                    blank_mask = jnp.ones((B, bl), dtype=bool)
                pieces.append(jnp.zeros((B, bl, D), dtype=self._dtype))
                masks.append(blank_mask)

        fused = jnp.concatenate(pieces, axis=1)  # [B, S_fused, D]
        fused_mask = jnp.concatenate(masks, axis=1)  # [B, S_fused]

        memory = self.encoder_cross(fused, fused_mask, None, deterministic)

        # Reference mean-pools over the *entire* sequence, padded positions
        # included (`models_MMT_v15_4.py:946`).
        fingerprint = self.fp1(jnp.mean(memory, axis=1))
        return EncoderOutput(memory, fused_mask, fingerprint)

    # ---------------------------------------------------------------- decoder

    def decode(
        self,
        trg_tokens: Array,  # [B, T] int ids (teacher-forcing input)
        memory: Array,  # [B, S, D]
        memory_key_padding_mask: Array,  # [B, S] bool
        deterministic: bool = True,
    ) -> Array:
        """Teacher-forced decoder pass -> logits [B, T, vocab]."""
        cfg = self.cfg
        T = trg_tokens.shape[1]
        positions = jnp.arange(T)[None, :]  # [1, T]
        emb = self.embed_trg(trg_tokens) + self.pe_trg(positions)
        emb = self.dropout_trg(emb, deterministic=deterministic)
        mask = causal_mask(T, dtype=self._dtype)
        dec = self.decoder(emb, memory, mask, memory_key_padding_mask, deterministic)
        logits = self.fc_out(dec)
        # blend path computed unconditionally so its params always exist
        # (torch registers the module either way); applied only when enabled.
        avg_memory = jnp.mean(memory, axis=1)
        blend = self.real_data_linear(avg_memory)  # [B, vocab]
        if cfg.use_real_data:
            logits = (logits + blend[:, None, :]) / 2
        return logits

    def __call__(
        self,
        batch: MMTBatch,
        trg_tokens: Optional[Array] = None,
        deterministic: bool = True,
    ):
        enc = self.encode(batch, deterministic)
        if trg_tokens is None:
            return enc
        logits = self.decode(trg_tokens, enc.memory, enc.memory_key_padding_mask, deterministic)
        return logits, enc.fingerprint, enc.memory, enc.memory_key_padding_mask


def init_params(cfg: ModelConfig, rng: jax.Array, batch_size: int = 2) -> Any:
    model = MultimodalTransformer(cfg)
    batch = dummy_batch(cfg, batch_size)
    trg = jnp.zeros((batch_size, 4), dtype=jnp.int32)
    # jit the init: Module.init otherwise runs EAGERLY, one device dispatch
    # per op — ~4.5 minutes through a remote-backend tunnel for the full
    # model vs seconds compiled (and the executable persists in the
    # compilation cache). Same params bit-for-bit.
    init = jax.jit(
        lambda r, b, t: model.init({"params": r}, b, t, True)["params"]
    )
    return init(rng, batch, trg)
