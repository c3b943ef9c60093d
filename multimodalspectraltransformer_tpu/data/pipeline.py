"""Host-side data pipeline: spectra CSVs -> fixed-shape device batches.

Reference counterpart: ``MultimodalData``/``collate_fn``
(`dataloaders_pl_v15_4.py:143-712`). Same on-disk format:

- per-modality CSVs with columns ``sample-id``, ``SMILES`` and ``shifts``
  holding stringified Python lists — 1H: ``[[ppm, intensity], ...]``,
  13C: ``[ppm, ...]``, HSQC: ``[[ppmH, ppmC], ...]``, COSY: ``[[ppmH,
  ppmH], ...]`` (`dataloaders_pl_v15_4.py:456-550`),
- IR: one CSV per sample id with a ``spectra`` column (~1801 points),
  mean-binned to ``ir_bins`` and max-normalized (`:324-346`).

Same normalizations: 1H ppm/10 (intensity untouched), 13C ppm/200, HSQC
(H/10, C/200), COSY (H/10, H/10); zero-pad to ``spectrum_points`` with
inverted masks (1 = padding); random per-sample modality blanking with
``blank_percentage`` falling back to 1H+13C when everything blanked
(`:597-626`); SMILES canonicalized and tokenized with <SOS>/<EOS> framing;
512-bit Morgan fingerprint target.

TPU-first differences: every sample is featurized to *static shapes* as
numpy, batches are plain stacks (no dynamic re-padding), and the loader is
a deterministic, seeded, per-host-shardable iterator.
"""

from __future__ import annotations

import ast
import os
import pickle
import random
import dataclasses
from dataclasses import dataclass, field
from typing import Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..chem import api as chem
from ..chem import tokenizer
from ..models.mmt import MMTBatch
from ..train.step import TrainBatch
from ..utils.config import ModelConfig

MODALITY_KEYS = ("1H", "13C", "HSQC", "COSY")


@dataclass
class SampleRecord:
    sample_id: str
    smiles: str
    h1: Optional[list] = None  # [[ppm, intensity], ...]
    c13: Optional[list] = None  # [ppm, ...]
    hsqc: Optional[list] = None  # [[H, C], ...]
    cosy: Optional[list] = None  # [[H, H], ...]
    ir: Optional[np.ndarray] = None  # raw spectrum (any length)


def _parse_shifts(value):
    if isinstance(value, str):
        return ast.literal_eval(value)
    return value


def load_spectra_csvs(
    csv_1h: str = "",
    csv_13c: str = "",
    csv_hsqc: str = "",
    csv_cosy: str = "",
    ir_folder: str = "",
    pickle_cache: str = "",
    limit: int = 0,
) -> list[SampleRecord]:
    """Load reference-format CSVs into joined per-sample records
    (reference `_load_sgnn_data`, `dataloaders_pl_v15_4.py:210-264`)."""
    def _stat(p: str):
        try:
            st = os.stat(p)
            return (st.st_mtime_ns, st.st_size)
        except OSError:
            return None

    # keyed on paths AND file mtimes/sizes: the factory always exports to
    # fixed names (data_1H_0.csv ...), so a regenerated corpus in the same
    # out_dir must invalidate the cache
    cache_key = {"1h": csv_1h, "13c": csv_13c, "hsqc": csv_hsqc,
                 "cosy": csv_cosy, "ir": ir_folder, "limit": limit,
                 "stat": [_stat(p) for p in (csv_1h, csv_13c, csv_hsqc, csv_cosy) if p]}
    if pickle_cache and os.path.exists(pickle_cache):
        with open(pickle_cache, "rb") as f:
            payload = pickle.load(f)
        # legacy caches stored a bare list; keyed caches validate that the
        # inputs match (a cache written for other CSVs/limit must not be
        # silently returned for this request)
        if isinstance(payload, dict) and "records" in payload:
            if payload.get("key") == cache_key:
                return payload["records"]
        elif isinstance(payload, list):
            print(f"load_spectra_csvs: using legacy (unkeyed) pickle cache {pickle_cache}")
            return payload

    import pandas as pd

    tables = {}
    for key, path in (("1H", csv_1h), ("13C", csv_13c), ("HSQC", csv_hsqc), ("COSY", csv_cosy)):
        if path:
            df = pd.read_csv(path)
            tables[key] = {str(r["sample-id"]): (r["SMILES"], r["shifts"]) for _, r in df.iterrows()}

    ids: list[str] = []
    seen = set()
    for t in tables.values():
        for sid in t:
            if sid not in seen:
                seen.add(sid)
                ids.append(sid)
    if limit:
        ids = ids[:limit]

    records = []
    for sid in ids:
        smiles = None
        fields: dict = {}
        for key, attr in (("1H", "h1"), ("13C", "c13"), ("HSQC", "hsqc"), ("COSY", "cosy")):
            if key in tables and sid in tables[key]:
                smi, shifts = tables[key][sid]
                smiles = smiles or smi
                try:
                    fields[attr] = _parse_shifts(shifts)
                except (ValueError, SyntaxError):
                    fields[attr] = None
        ir = None
        if ir_folder:
            path = os.path.join(ir_folder, f"{sid}.csv")
            if os.path.exists(path):
                ir = pd.read_csv(path)["spectra"].to_numpy()
        if smiles is None:
            continue
        records.append(SampleRecord(sid, smiles, ir=ir, **fields))

    if pickle_cache:
        with open(pickle_cache, "wb") as f:
            pickle.dump({"key": cache_key, "records": records}, f)
    return records


def ref_testset_split(sample_id: str) -> str:
    """Stable 50/50 split of the reference's shipped test molecules into an
    'adapt' half (may supply domain-adaptation training signal — see
    scripts/sgnn_adapt.py) and an 'eval' half that no training may touch.
    Keyed on the sample id so the split is identical across loaders,
    scripts, and sessions."""
    import hashlib

    h = int(hashlib.sha1(sample_id.encode()).hexdigest(), 16)
    return "adapt" if h % 2 == 0 else "eval"


def load_reference_testset(
    csv_13c: str = "",
    csv_hsqc: str = "",
    csv_cosy: str = "",
    csv_1h: str = "",
    limit: int = 0,
) -> list[SampleRecord]:
    """Load the reference's SHIPPED held-out test sets: headerless CSVs of
    ``SMILES,"[data]",sample-id`` rows, one file per modality over the same
    molecules (`MMT_website/Runfolder/CSV_files/ML_NMR_5M_XL_{13C,HSQC,COSY}
    _test_10x100.csv` + `ML_NMR_1H_combined_ZINC_test_10x100.csv` — 1000
    ZINC molecules, 250-350 Da, with SGNN-simulated spectra).

    Per-modality payloads: 13C a flat shift list, HSQC ``[H, C]`` pairs,
    COSY ``(H, H)`` tuples, 1H ``(ppm, relative-intensity)`` peaks — all
    ``ast.literal_eval``-able; tuples are normalized to the list-of-lists
    form :func:`featurize` consumes. Records are joined by sample id."""
    import csv as _csv

    tables: dict[str, dict] = {}
    for key, path in (
        ("1H", csv_1h), ("13C", csv_13c), ("HSQC", csv_hsqc), ("COSY", csv_cosy)
    ):
        if not path:
            continue
        t: dict = {}
        with open(path, newline="") as f:
            for row in _csv.reader(f):
                if len(row) < 3:
                    continue
                smi, data, sid = row[0].strip(), row[1], row[2].strip()
                try:
                    parsed = _parse_shifts(data)
                except (ValueError, SyntaxError):
                    continue
                if key != "13C":
                    parsed = [list(p) for p in parsed]
                t[sid] = (smi, parsed)
        tables[key] = t

    ids: list[str] = []
    seen: set = set()
    for t in tables.values():
        for sid in t:
            if sid not in seen:
                seen.add(sid)
                ids.append(sid)
    if limit:
        ids = ids[:limit]

    records = []
    for sid in ids:
        smiles = None
        fields: dict = {}
        for key, attr in (("1H", "h1"), ("13C", "c13"), ("HSQC", "hsqc"), ("COSY", "cosy")):
            if key in tables and sid in tables[key]:
                smi, data = tables[key][sid]
                smiles = smiles or smi
                fields[attr] = data
        if smiles is None:
            continue
        records.append(SampleRecord(sid, smiles, **fields))
    return records


def load_real_example(
    dir_path: str,
    use_ir: bool = True,
    limit: int = 0,
) -> list[SampleRecord]:
    """Load the reference's shipped REAL experimental dataset: 5 AstraZeneca
    molecules with measured 1H/13C/HSQC/COSY + IR spectra
    (`MMT_website/Runfolder/CSV_files/website_real_example/
    real_{1H,13C,HSQC,COSY}_with_AZ_SMILES_v3.csv` + `real_IR/<id>.csv`) —
    the input of the reference's experimental-data route
    (`MMT_website/app.py:831` /run_model_exp_data) and its ``real_data``
    fine-tuning path.

    Format quirks vs the simulated CSVs: semicolon-separated with a
    ``sample-id;shifts;SN_Number;AZ_Number;SMILES`` header; SMILES carry
    stereo markers and explicit ``[H]`` atoms (normalized away here — the
    reference evaluates with isomericSmiles=false and the vocab has no
    [H] token); IR files have ``wavelength,spectra`` columns."""
    import csv as _csv

    from ..chem import api as chem_api

    by_id: dict[str, SampleRecord] = {}
    order: list[str] = []
    for key, attr in (("1H", "h1"), ("13C", "c13"), ("HSQC", "hsqc"), ("COSY", "cosy")):
        path = os.path.join(dir_path, f"real_{key}_with_AZ_SMILES_v3.csv")
        if not os.path.exists(path):
            continue
        with open(path, newline="") as f:
            for row in _csv.DictReader(f, delimiter=";"):
                sid = row["sample-id"].strip()
                try:
                    data = _parse_shifts(row["shifts"])
                except (ValueError, SyntaxError):
                    continue
                if key != "13C":
                    data = [list(p) for p in data]
                if sid not in by_id:
                    from ..chem import cleaning

                    # stereo first ([C@] -> C restores the implicit H),
                    # then drop the explicit [H] atoms
                    smi = cleaning.remove_stereo(row["SMILES"].strip())
                    smi = smi.replace("[H]", "")
                    can = chem_api.canonicalize(smi)
                    if can is None:
                        continue
                    by_id[sid] = SampleRecord(sid, can)
                    order.append(sid)
                setattr(by_id[sid], attr, data)
    if use_ir:
        ir_dir = os.path.join(dir_path, "real_IR")
        for sid, rec in by_id.items():
            path = os.path.join(ir_dir, f"{sid}.csv")
            if os.path.exists(path):
                spectra = []
                with open(path, newline="") as f:
                    for row in _csv.DictReader(f):
                        spectra.append(float(row["spectra"]))
                rec.ir = np.asarray(spectra)
    recs = [by_id[s] for s in order]
    return recs[:limit] if limit else recs


def bin_ir(raw: np.ndarray, bins: int) -> np.ndarray:
    """Mean-bin + max-normalize (reference `_load_IR_data`, `:324-346`).

    Vectorized: the naive per-bin ``raw[a:b].mean()`` loop costs ~30 ms per
    record (1000 numpy-call dispatches) and dominated corpus featurization.
    Bin edges keep the original accumulated ``start += span`` + banker's
    ``round`` semantics, and segment sums add elements in the same order
    np.mean does for short segments (<8), so outputs are bit-identical for
    the 1801-point IR inputs (segments of 1-2 elements)."""
    raw = np.asarray(raw, dtype=np.float64)
    max_val = raw.max() if raw.size else 1.0
    span = len(raw) / bins
    edges = np.empty(bins + 1, dtype=np.int64)
    start = 0.0
    for i in range(bins + 1):
        edges[i] = round(start)
        start += span
    lo, hi = edges[:-1], edges[1:]
    counts = hi - lo
    out = np.zeros(bins)
    for c in np.unique(counts):
        if c <= 0:
            continue
        rows = np.nonzero(counts == c)[0]
        acc = raw[lo[rows]].copy()
        for k in range(1, int(c)):
            acc += raw[lo[rows] + k]
        out[rows] = acc / float(c) / max_val
    return out


def _pad_points(points: Sequence, length: int, dims: int) -> tuple[np.ndarray, np.ndarray]:
    """Zero-pad to [length(, dims)] with inverted mask (1 = padding),
    truncating overlong lists (reference `_zero_pad`, `:267-299`)."""
    mask = np.ones(length, dtype=np.int32)
    if dims == 1:
        out = np.zeros(length, dtype=np.float32)
        pts = np.asarray(points, dtype=np.float32)[:length]
    else:
        out = np.zeros((length, dims), dtype=np.float32)
        pts = np.asarray([list(p) for p in points], dtype=np.float32)[:length]
    n = len(pts)
    if n:
        out[:n] = pts
        mask[:n] = 0
    return out, mask


@dataclass
class FeaturizeOptions:
    blank_percentage: float = 0.0
    randomize_smiles: bool = False
    # trust rec.smiles as the target form (pre-randomized augmentation
    # variant from augment_records): target/MS-hint tokens use it verbatim
    # instead of the canonical form, keeping featurization DETERMINISTIC so
    # the device-resident dataset path stays usable (randomize_smiles
    # re-rolls per epoch and forces the host path)
    use_given_smiles_form: bool = False
    use_ir: bool = True
    # HSQC noise pollution (reference pollute_HSQC_data,
    # `dataloaders_pl_v15_4.py:117-140`): inject up to `hsqc_noise_max`
    # random extra peaks drawn from a pool (or uniform over the ppm ranges)
    hsqc_noise_max: int = 0
    hsqc_noise_pool: Optional[list] = None  # [(dH, dC), ...]


def pollute_hsqc(
    peaks: list, opts: "FeaturizeOptions", rng: random.Random
) -> list:
    """Add 0..hsqc_noise_max random noise peaks to an HSQC peak list
    (the reference samples from an experimental noise-peak pool; without a
    pool, peaks are drawn uniformly over typical 1H/13C ranges)."""
    if opts.hsqc_noise_max <= 0:
        return peaks
    n = rng.randint(0, opts.hsqc_noise_max)
    out = list(peaks)
    for _ in range(n):
        if opts.hsqc_noise_pool:
            h, c = rng.choice(opts.hsqc_noise_pool)[:2]
        else:
            h, c = rng.uniform(0.0, 10.0), rng.uniform(0.0, 200.0)
        out.append([h, c])
    return out


# Bump when featurize/collate OUTPUT changes (keys the on-disk feature
# cache; output-preserving refactors must NOT bump it)
FEATURIZE_SCHEMA_VERSION = 2  # v2: compact storage dtypes (see compact_train_batch)


def featurize(
    rec: SampleRecord,
    mcfg: ModelConfig,
    opts: Optional[FeaturizeOptions] = None,
    rng: Optional[random.Random] = None,
    pre: Optional[tuple] = None,
) -> Optional[dict]:
    """One sample -> fixed-shape numpy features. None if chemistry fails
    (mirrors the reference's silent skip).

    ``pre`` optionally supplies the per-molecule chemistry as
    ``(canonical_smiles, formula, exact_mw, morgan_fp)`` — computed in bulk
    through the threaded native kernel (see Loader.device_dataset) instead
    of four Python SMILES parses per sample. Entries may be None/NaN for
    invalid molecules; outputs are bit-identical either way (the native
    kernel mirrors the Python spec)."""
    opts = opts or FeaturizeOptions()
    rng = rng or random.Random(0)
    P = mcfg.spectrum_points

    if pre is not None:
        c_smi, mf, mw, fp = pre
        if mw is not None and np.isnan(mw):
            mw = None
    else:
        c_smi = chem.canonicalize(rec.smiles)
        if c_smi is None:
            return None
        mf = chem.mol_formula(c_smi)
        mw = chem.exact_mol_wt(c_smi)
        fp = chem.morgan_fp(c_smi, 2, mcfg.fingerprint_size)
    if c_smi is None or mf is None or mw is None or fp is None:
        return None
    if opts.randomize_smiles:
        rnd = chem.randomize(c_smi, rng)
        if rnd is not None:
            c_smi = rnd
    elif opts.use_given_smiles_form:
        c_smi = rec.smiles  # pre-randomized variant (validated above)

    out: dict = {}
    active = []

    def blanked() -> bool:
        return rng.random() < opts.blank_percentage

    # 1H: [ppm/10, intensity]
    if rec.h1 is not None and not blanked():
        pts = [[s[0] / 10.0, s[1]] for s in rec.h1]
        out["src_1h"], out["mask_1h"] = _pad_points(pts, P, 2)
        active.append("1H")
    else:
        out["src_1h"], out["mask_1h"] = np.zeros((P, 2), np.float32), np.ones(P, np.int32)

    # 13C: ppm/200
    if rec.c13 is not None and not blanked():
        pts = [s / 200.0 for s in rec.c13]
        out["src_13c"], out["mask_13c"] = _pad_points(pts, P, 1)
        active.append("13C")
    else:
        out["src_13c"], out["mask_13c"] = np.zeros(P, np.float32), np.ones(P, np.int32)

    # HSQC: [H/10, C/200]
    if rec.hsqc is not None and not blanked():
        hsqc_peaks = pollute_hsqc(rec.hsqc, opts, rng)
        pts = [[p[0] / 10.0, p[1] / 200.0] for p in hsqc_peaks]
        out["src_hsqc"], out["mask_hsqc"] = _pad_points(pts, P, 2)
        active.append("HSQC")
    else:
        out["src_hsqc"], out["mask_hsqc"] = np.zeros((P, 2), np.float32), np.ones(P, np.int32)

    # COSY: [H/10, H/10]
    if rec.cosy is not None and not blanked():
        pts = [[p[0] / 10.0, p[1] / 10.0] for p in rec.cosy]
        out["src_cosy"], out["mask_cosy"] = _pad_points(pts, P, 2)
        active.append("COSY")
    else:
        out["src_cosy"], out["mask_cosy"] = np.zeros((P, 2), np.float32), np.ones(P, np.int32)

    # IR
    if opts.use_ir and rec.ir is not None and not blanked():
        out["src_ir"] = bin_ir(rec.ir, mcfg.ir_bins).astype(np.float32)
        active.append("IR")
    else:
        out["src_ir"] = np.zeros(mcfg.ir_bins, np.float32)

    # all blanked -> restore 1H + 13C (reference `:597-626`)
    if not active:
        if rec.h1 is not None:
            pts = [[s[0] / 10.0, s[1]] for s in rec.h1]
            out["src_1h"], out["mask_1h"] = _pad_points(pts, P, 2)
        if rec.c13 is not None:
            pts = [s / 200.0 for s in rec.c13]
            out["src_13c"], out["mask_13c"] = _pad_points(pts, P, 1)

    out["src_mf"], out["mask_mf"] = tokenizer.encode_mf_framed(mf, mcfg.mf_len)
    # the MS hint has its own declared length (ModelConfig.ms_len drives the
    # encoder's static layout); the decoder target frames to spectrum_points
    out["src_ms"], out["mask_ms"] = tokenizer.encode_smiles_framed(c_smi, mcfg.ms_len)
    trg, _trg_mask = tokenizer.encode_smiles_framed(c_smi, mcfg.spectrum_points)
    out["mw"] = np.float32(mw)
    out["trg_tokens"] = trg.astype(np.int32)
    out["trg_fp"] = fp.astype(np.float32)
    out["smiles"] = c_smi
    out["sample_id"] = rec.sample_id
    return out


def collate(samples: Sequence[dict]) -> TrainBatch:
    """Stack featurized samples into a TrainBatch of device-ready arrays."""
    st = lambda k: np.stack([s[k] for s in samples])
    inputs = MMTBatch(
        src_1h=st("src_1h"), mask_1h=st("mask_1h"),
        src_13c=st("src_13c"), mask_13c=st("mask_13c"),
        src_hsqc=st("src_hsqc"), mask_hsqc=st("mask_hsqc"),
        src_cosy=st("src_cosy"), mask_cosy=st("mask_cosy"),
        src_ir=st("src_ir"),
        src_mf=st("src_mf"), mask_mf=st("mask_mf"),
        src_ms=st("src_ms"), mask_ms=st("mask_ms"),
        mw=st("mw"),
    )
    return TrainBatch(inputs, st("trg_tokens"), st("trg_fp"))


@dataclass
class Loader:
    """Deterministic, seeded, shardable batch iterator.

    Replaces torch DataLoader+DistributedSampler: each host takes the slice
    ``host_id::host_count`` of every epoch permutation, so multi-host data
    parallelism needs no coordination (SURVEY.md §5.8).
    """

    records: list[SampleRecord]
    mcfg: ModelConfig
    batch_size: int
    opts: FeaturizeOptions = field(default_factory=FeaturizeOptions)
    seed: int = 0
    host_id: int = 0
    host_count: int = 1
    drop_remainder: bool = True
    # batch ordering: "shuffle" | "weight_sorted" | "tanimoto" (hard-negative
    # batches for contrastive training; data/samplers.py, reference
    # `clip_functions_v15_4.py:117-187`)
    order_strategy: str = "shuffle"
    # cache featurized samples across epochs when featurization is
    # deterministic (no augmentation): host featurize (~15 ms/sample of
    # chemistry) otherwise dominates small-model training throughput
    cache_features: bool = True
    _feature_cache: dict = field(default_factory=dict, repr=False)

    def __len__(self) -> int:
        per_host = len(self.records) // self.host_count
        return per_host // self.batch_size

    def _stochastic(self) -> bool:
        return (
            self.opts.blank_percentage > 0
            or self.opts.randomize_smiles
            or self.opts.hsqc_noise_max > 0
        )

    def _host_slice(self, order):
        """This host's share of an epoch order: a CONTIGUOUS block,
        truncated to the common per-host length.

        Contiguous (not strided ``order[h::H]``) because the ordering
        strategies build hard-negative structure as contiguous batch runs
        (samplers.tanimoto_anchor_order / weight_sorted_order) that a
        stride would interleave away; truncated because unequal per-host
        element counts would make one host dispatch a collective train
        step the others never join (multi-host lockstep hang)."""
        if self.host_count <= 1:
            return order
        per_host = len(order) // self.host_count
        return order[self.host_id * per_host : (self.host_id + 1) * per_host]

    def epoch(self, epoch: int) -> Iterator[TrainBatch]:
        from . import samplers

        order = samplers.epoch_order(
            self.order_strategy, [r.smiles for r in self.records],
            self.batch_size, self.seed, epoch,
        )
        order = self._host_slice(order)
        rng = random.Random(self.seed * 1_000_003 + epoch * 1009 + self.host_id)
        use_cache = self.cache_features and not self._stochastic()
        buf: list[dict] = []
        for idx in order:
            idx = int(idx)
            if use_cache and idx in self._feature_cache:
                feat = self._feature_cache[idx]
            else:
                feat = featurize(self.records[idx], self.mcfg, self.opts, rng)
                if use_cache:
                    self._feature_cache[idx] = feat
            if feat is None:
                continue
            buf.append(feat)
            if len(buf) == self.batch_size:
                yield collate(buf)
                buf = []
        if buf and not self.drop_remainder:
            yield collate(buf)

    # ---- device-resident dataset -----------------------------------------
    #
    # The host->device path uploads every batch (slow on remote backends:
    # ~2 MB/s through a tunnel = hundreds of ms per batch, dominating the
    # train step). When featurization is deterministic and the dataset
    # fits, featurize + collate EVERYTHING once, park it on the device,
    # and assemble each step's batch with an on-device gather driven by a
    # tiny (batch_size * 4 B) index upload. TPU-idiomatic: static shapes,
    # one executable, data stays in HBM.

    def features_digest(self) -> str:
        """Content hash identifying the featurized form of this dataset:
        record contents + the model's static layout + featurize options +
        FEATURIZE_SCHEMA_VERSION (bumped on output-changing edits)."""
        import hashlib

        h = hashlib.sha256()
        h.update(str(FEATURIZE_SCHEMA_VERSION).encode())
        h.update(repr((
            self.mcfg.spectrum_points, self.mcfg.ir_bins, self.mcfg.mf_len,
            self.mcfg.ms_len, self.mcfg.fingerprint_size,
        )).encode())
        h.update(repr(dataclasses.asdict(self.opts)).encode())
        h.update(str(len(self.records)).encode())
        for r in self.records:
            h.update(r.smiles.encode())
            for v in (r.h1, r.c13, r.hsqc, r.cosy, r.ir):
                h.update(b";")
                if v is not None:
                    h.update(np.asarray(v, np.float32).tobytes())
            h.update(b"\n")
        return h.hexdigest()[:16]

    @staticmethod
    def _save_features_npz(path: str, big: TrainBatch, kept_idx: np.ndarray) -> None:
        arrays = {f"inputs_{k}": getattr(big.inputs, k) for k in MMTBatch._fields}
        arrays["trg_tokens"] = big.trg_tokens
        arrays["trg_fp"] = big.trg_fp
        arrays["kept_idx"] = np.asarray(kept_idx, np.int64)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)

    @staticmethod
    def _load_features_npz(path: str) -> tuple[TrainBatch, Optional[np.ndarray]]:
        z = np.load(path)
        inputs = MMTBatch(**{k: z[f"inputs_{k}"] for k in MMTBatch._fields})
        kept = z["kept_idx"] if "kept_idx" in z.files else None  # legacy: identity
        return TrainBatch(inputs, z["trg_tokens"], z["trg_fp"]), kept

    # Compact storage dtypes for the HBM-resident dataset. A fp32/int32
    # featurized record costs ~10.1 KB; at 578k records (augment 2x over a
    # ~290k corpus) that is 5.9 GiB — which OOMed the v5e next to the train
    # state. Stored compact it is ~4.1 KB/record (2.4 GiB): spectra as
    # float16 (11-bit significand ≫ the bf16 the compute path rounds them
    # to anyway), masks int8, token ids uint8 (SMILES vocab 43, MF vocab
    # 212), fingerprint bits int8. `gather_rows`/`sharded_gather_fn`
    # restore canonical dtypes inside the per-step gather, so consumers
    # see f32/int32 exactly as before and the casts fuse into the gather.
    _F16_FIELDS = ("src_1h", "src_13c", "src_hsqc", "src_cosy", "src_ir")
    _I8_FIELDS = ("mask_1h", "mask_13c", "mask_hsqc", "mask_cosy",
                  "mask_mf", "mask_ms")
    _U8_FIELDS = ("src_mf", "src_ms")

    @classmethod
    def compact_train_batch(cls, big: TrainBatch) -> TrainBatch:
        """Host-side: re-encode a featurized TrainBatch with the compact
        storage dtypes above (idempotent)."""
        rep = {}
        for k in MMTBatch._fields:
            v = np.asarray(getattr(big.inputs, k))
            if k in cls._F16_FIELDS:
                v = v.astype(np.float16)
            elif k in cls._I8_FIELDS:
                v = v.astype(np.int8)
            elif k in cls._U8_FIELDS:
                assert v.min() >= 0 and v.max() < 256, f"{k} exceeds uint8"
                v = v.astype(np.uint8)
            # mw stays float32 (exact conditioning value, [B] — negligible)
            rep[k] = v
        trg = np.asarray(big.trg_tokens)
        assert trg.min() >= 0 and trg.max() < 256, "trg_tokens exceeds uint8"
        return TrainBatch(
            MMTBatch(**rep), trg.astype(np.uint8),
            np.asarray(big.trg_fp).astype(np.int8),
        )

    def _featurize_all(self, max_bytes: int):
        """Featurize every record to one host-side TrainBatch (with the
        MMT_FEATURE_CACHE disk cache); shared by :meth:`device_dataset`
        and :meth:`device_dataset_sharded`. Returns (big, kept_idx) or
        None on fallback (stochastic featurization / size cap), printing
        the reason."""
        if self._stochastic():
            print(
                "device_dataset: featurization is stochastic (per-epoch SMILES "
                "randomization / blanking / noise); falling back to the host loader"
            )
            return None

        cache_dir = os.environ.get("MMT_FEATURE_CACHE", "")
        cache_path = None
        big = None
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
            cache_path = os.path.join(
                cache_dir, f"mmt_features_{self.features_digest()}.npz"
            )
            if os.path.exists(cache_path):
                big, kept_idx = self._load_features_npz(cache_path)
                print(f"device_dataset: loaded featurized cache {cache_path}")
        if big is None:
            # bulk chemistry through the threaded native kernel: canonicalize
            # every record once, then formula/MW/fingerprint on the canonical
            # forms (featurize's exact semantics) — vs four Python SMILES
            # parses per sample, this is the difference between minutes and
            # tens of minutes on a multi-100k corpus
            smis = [r.smiles for r in self.records]
            canons = chem.batch_canonicalize(smis)
            safe = [c if c is not None else "" for c in canons]
            mfs = chem.batch_mol_formula(safe)
            mws = chem.batch_exact_mol_wt(safe)
            fps, fp_ok = chem.batch_morgan_fp(safe, 2, self.mcfg.fingerprint_size)
            feats = []
            kept_list: list[int] = []
            for i, r in enumerate(self.records):
                pre = (
                    canons[i], mfs[i] if canons[i] is not None else None,
                    float(mws[i]), fps[i] if fp_ok[i] else None,
                )
                f = featurize(r, self.mcfg, self.opts, pre=pre)
                if f is not None:
                    feats.append(f)
                    kept_list.append(i)
            if not feats:
                return None
            if len(feats) != len(self.records):
                # keep the HBM-resident path (falling back to the host
                # loader costs ~8x steps/s on the tunneled backend): drop
                # the failures up front and order epochs over the kept
                # records. Batch compositions diverge slightly from the
                # host path, which orders over ALL records and drops
                # failures after batching.
                import sys

                print(
                    f"device_dataset: dropping {len(self.records) - len(feats)} "
                    f"records that failed featurization (keeping the device "
                    f"path with {len(feats)} records)",
                    file=sys.stderr,
                )
            kept_idx = np.asarray(kept_list, np.int64)
            big = self.compact_train_batch(collate(feats))
            if cache_path is not None:
                self._save_features_npz(cache_path, big, kept_idx)
                print(f"device_dataset: wrote featurized cache {cache_path}")
        # loads of pre-v2 caches arrive fat; re-encode (idempotent)
        big = self.compact_train_batch(big)
        nbytes = sum(np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(big))
        if nbytes > max_bytes:
            import sys

            print(
                f"device_dataset: featurized set is {nbytes / (1 << 30):.1f} GiB "
                f"> cap {max_bytes / (1 << 30):.1f} GiB; falling back to the host "
                "path (raise MMT_DEVICE_DATASET_GB if it fits HBM)",
                file=sys.stderr,
            )
            return None
        # row i of the dataset is self.records[kept_idx[i]] (identity when
        # every record featurized; legacy caches without kept_idx imply it)
        if kept_idx is None:
            kept_idx = np.arange(len(self.records), dtype=np.int64)
        return big, kept_idx

    def device_dataset(self, max_bytes: Optional[int] = None):
        """One TrainBatch holding every featurizable record, device_put.

        Returns None when featurization is stochastic (augmentation needs
        fresh host features each epoch) or the dataset exceeds
        ``max_bytes`` (default 6 GiB — v5e HBM is 16 GiB and the full model
        + optimizer take ~1.5 GiB; override with MMT_DEVICE_DATASET_GB).
        Cached after the first call. Falling back to the host loader is an
        ~8x training slowdown on the tunneled backend, so every fallback
        prints its reason.

        Set ``MMT_FEATURE_CACHE=<dir>`` to also persist the featurized
        arrays to disk, keyed by :meth:`features_digest` — host
        featurization of a multi-100k-record corpus costs tens of minutes
        of chemistry; reloading the cached ``.npz`` takes seconds. The
        cache is only written when EVERY record featurized (the only case
        this method returns the dataset), so a hit implies full coverage."""
        if max_bytes is None:
            max_bytes = int(float(os.environ.get("MMT_DEVICE_DATASET_GB", "6")) * (1 << 30))
        cached = getattr(self, "_device_dataset", None)
        if cached is not None:
            return cached
        out = self._featurize_all(max_bytes)
        if out is None:
            return None
        big, kept_idx = out
        self._device_kept_smiles = [self.records[int(i)].smiles for i in kept_idx]
        self._device_dataset = jax.tree_util.tree_map(jnp.asarray, big)
        return self._device_dataset

    def device_dataset_sharded(self, mesh, max_bytes: Optional[int] = None):
        """The multi-device ``device_dataset``: the featurized corpus is
        PARTITIONED row-wise over the mesh's data-parallel axes — shard d
        holds rows ``[d*Rl, (d+1)*Rl)`` in its own HBM — and each training
        batch is assembled by a shard-LOCAL gather (:func:`sharded_gather_fn`,
        a ``shard_map`` with zero collectives). This lifts the old
        device_data-vs-mesh restriction that silently dropped multi-chip
        runs to the ~8x-slower host loader.

        Sampling semantics are the DistributedSampler equivalent (SURVEY
        §5.8): each shard draws its sub-batch from its own partition with
        the Loader's ordering strategy (per-shard seed), exactly like the
        multi-host ``_host_slice`` path. ``max_bytes`` caps the PER-SHARD
        bytes (each chip stores only its partition). Rows beyond a multiple
        of the shard count are dropped (< one row per shard)."""
        from .. import parallel
        from jax.sharding import NamedSharding, PartitionSpec

        if max_bytes is None:
            max_bytes = int(float(os.environ.get("MMT_DEVICE_DATASET_GB", "6")) * (1 << 30))
        ext = parallel.data_extent(mesh)
        cached = getattr(self, "_device_dataset_sharded", None)
        if cached is not None and getattr(self, "_device_shard_extent", None) == ext:
            return cached
        out = self._featurize_all(max_bytes * ext)
        if out is None:
            return None
        big, kept_idx = out
        R = big.trg_tokens.shape[0]
        Rl = R // ext
        if Rl == 0:
            print("device_dataset_sharded: fewer rows than shards; host loader")
            return None
        if R % ext:
            big = jax.tree_util.tree_map(lambda x: x[: Rl * ext], big)
            kept_idx = kept_idx[: Rl * ext]
        axes = ("dcn", "data") if "dcn" in mesh.axis_names else ("data",)
        sharding = NamedSharding(mesh, PartitionSpec(axes))
        self._device_kept_smiles = [self.records[int(i)].smiles for i in kept_idx]
        self._device_shard_extent = ext
        self._device_dataset_sharded = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), sharding), big
        )
        return self._device_dataset_sharded

    def epoch_row_batches_sharded(self, epoch: int, n_shards: int) -> Iterator[np.ndarray]:
        """Per-batch LOCAL row-index arrays for the sharded dataset: the
        returned ``[batch_size]`` vector's segment d holds
        ``batch_size/n_shards`` indices in ``[0, R_local)`` drawn from
        shard d's partition by the Loader's ordering strategy (per-shard
        seed) — feed it (batch-sharded) to :func:`sharded_gather_fn`."""
        from . import samplers

        smiles = getattr(self, "_device_kept_smiles", None)
        assert smiles is not None, "call device_dataset_sharded() first"
        assert self.batch_size % n_shards == 0, (
            f"batch {self.batch_size} not divisible by {n_shards} shards"
        )
        bs_local = self.batch_size // n_shards
        Rl = len(smiles) // n_shards
        orders = []
        for d in range(n_shards):
            part = smiles[d * Rl : (d + 1) * Rl]
            orders.append(
                samplers.epoch_order(
                    self.order_strategy, part, bs_local,
                    self.seed * 1_000_003 + d, epoch,
                )
            )
        n_batches = Rl // bs_local
        for i in range(n_batches):
            segs = [
                np.asarray(o[i * bs_local : (i + 1) * bs_local], np.int32)
                for o in orders
            ]
            yield np.concatenate(segs)

    def epoch_row_batches(self, epoch: int) -> Iterator[np.ndarray]:
        """Per-batch row-index arrays into device_dataset(), using the same
        ordering strategy / seed / host sharding as `epoch`. (Rows index the
        FEATURIZABLE records, so compositions can differ from the host path
        only when some records fail featurization.)"""
        from . import samplers

        smiles = getattr(self, "_device_kept_smiles", None)
        assert smiles is not None, "call device_dataset() first"
        order = samplers.epoch_order(
            self.order_strategy, smiles, self.batch_size, self.seed, epoch
        )
        order = self._host_slice(order)
        for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
            yield np.asarray(order[i : i + self.batch_size], np.int32)
        rem = len(order) % self.batch_size
        if rem and not self.drop_remainder:
            yield np.asarray(order[-rem:], np.int32)


@jax.jit
def restore_train_batch(big: TrainBatch) -> TrainBatch:
    """Device-side inverse of :meth:`Loader.compact_train_batch`: cast the
    compact storage dtypes back to the canonical featurize dtypes
    (f32 spectra/fingerprint, int32 masks/ids). Safe under jit — the casts
    fuse into the surrounding gather; no-op on already-canonical batches."""
    def _restore(k, v):
        if v.dtype in (jnp.float16, jnp.bfloat16):
            return v.astype(jnp.float32)
        if v.dtype in (jnp.int8, jnp.uint8):
            return v.astype(jnp.int32)
        return v
    inputs = MMTBatch(**{
        k: _restore(k, getattr(big.inputs, k)) for k in MMTBatch._fields
    })
    trg = big.trg_tokens
    if trg.dtype != jnp.int32:
        trg = trg.astype(jnp.int32)
    fp = big.trg_fp
    if fp.dtype != jnp.float32:
        fp = fp.astype(jnp.float32)
    return TrainBatch(inputs, trg, fp)


@jax.jit
def gather_rows(dataset, idx: jax.Array):
    """On-device batch assembly: rows `idx` of every dataset leaf (compact
    storage dtypes are restored to canonical ones on the way out). Jitted:
    one dispatch per step instead of one per leaf per step (the tunneled
    backend pays ~ms per RPC), and the restore casts fuse into the gather."""
    out = jax.tree_util.tree_map(lambda x: x[idx], dataset)
    return restore_train_batch(out) if isinstance(out, TrainBatch) else out


def sharded_gather_fn(mesh):
    """Compiled shard-LOCAL batch assembly for
    :meth:`Loader.device_dataset_sharded`: every shard gathers its
    sub-batch from its OWN partition (``shard_map`` over the data-parallel
    axes — by construction no cross-shard indices exist, so XLA emits a
    plain local dynamic-gather, zero collectives; a global gather over a
    sharded operand would have all-gathered the index space every step).
    Returns ``f(dataset, idx)`` where ``idx`` comes from
    :meth:`Loader.epoch_row_batches_sharded` (batch-sharded)."""
    from jax.sharding import PartitionSpec
    try:
        from jax.experimental.shard_map import shard_map
    except ImportError:  # moved in newer jax
        from jax.sharding import shard_map  # type: ignore

    axes = ("dcn", "data") if "dcn" in mesh.axis_names else ("data",)
    spec = PartitionSpec(axes)

    def local_gather(data, idx):
        out = jax.tree_util.tree_map(lambda x: x[idx], data)
        return restore_train_batch(out) if isinstance(out, TrainBatch) else out

    f = shard_map(
        local_gather, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
        check_rep=False,
    )
    return jax.jit(f)


# --------------------------------------------------------------------------
# Synthetic data: plausible molecules + pseudo-spectra for tests/benchmarks
# (the reference's data factory needs SGNN/chemprop weights that don't ship;
# sim/ provides trainable predictors, this provides deterministic fixtures).
# --------------------------------------------------------------------------

_FRAGMENTS = [
    "CC", "CCC", "CC(C)", "CCO", "CC=O", "C(=O)O", "C(=O)N", "CN", "CO",
    "c1ccccc1", "c1ccncc1", "c1ccc(cc1)", "C1CCCCC1", "CCl", "CBr", "C#N",
    "CF", "CS", "C=C", "COC", "CC(N)",
]


def random_smiles(rng: random.Random, max_frags: int = 4) -> str:
    """Assemble a random valid molecule by concatenating fragments."""
    n = rng.randint(1, max_frags)
    smi = "".join(rng.choice(_FRAGMENTS) for _ in range(n))
    can = chem.canonicalize(smi)
    return can if can is not None else "CCO"


def _env_hash(*vals) -> float:
    """Process-stable pseudo-shift in [0, 1): Python's hash() is salted per
    interpreter (PYTHONHASHSEED), which silently made the "deterministic"
    fixtures differ between runs."""
    import hashlib

    digest = hashlib.sha256("|".join(map(str, vals)).encode()).digest()
    return int.from_bytes(digest[:4], "little") % 1000 / 1000.0


def synthetic_record(rng: random.Random, sample_id: str) -> SampleRecord:
    """Deterministic pseudo-spectra derived from the molecule's own
    structure (hash-based shifts): good enough for pipeline/overfit tests
    where the model just needs learnable structure<->spectrum correlation."""
    smi = random_smiles(rng)
    from ..chem.smiles import parse_smiles

    mol = parse_smiles(smi)
    h1, c13, hsqc, cosy = [], [], [], []
    for i, a in enumerate(mol.atoms):
        env = _env_hash(a.symbol, mol.degree(i), mol.total_h(i), a.aromatic)
        if a.symbol == "C":
            c_shift = 10 + env * 180
            c13.append(round(c_shift, 2))
            nh = mol.total_h(i)
            if nh:
                h_shift = 0.5 + env * 8
                h1.append([round(h_shift, 2), nh])
                hsqc.append([round(h_shift, 2), round(c_shift, 2)])
        # COSY crosspeaks for adjacent C-H pairs
    for b in mol.bonds:
        a1, a2 = mol.atoms[b.a1], mol.atoms[b.a2]
        if a1.symbol == "C" and a2.symbol == "C" and mol.total_h(b.a1) and mol.total_h(b.a2):
            e1 = _env_hash(a1.symbol, mol.degree(b.a1), mol.total_h(b.a1), a1.aromatic)
            e2 = _env_hash(a2.symbol, mol.degree(b.a2), mol.total_h(b.a2), a2.aromatic)
            cosy.append([round(0.5 + e1 * 8, 2), round(0.5 + e2 * 8, 2)])
    ir = np.abs(np.sin(np.linspace(0, 20, 1801) * (1 + int(_env_hash(smi) * 7000) % 7)))
    return SampleRecord(sample_id, smi, h1=h1 or None, c13=c13 or None, hsqc=hsqc or None, cosy=cosy or None, ir=ir)


def synthetic_dataset(n: int, seed: int = 0) -> list[SampleRecord]:
    rng = random.Random(seed)
    return [synthetic_record(rng, str(i)) for i in range(n)]


def augment_records(
    records: Sequence[SampleRecord], variants: int, seed: int = 0
) -> list[SampleRecord]:
    """SMILES-randomization augmentation as record expansion: each record
    plus (variants-1) randomized-SMILES copies sharing its spectra (the
    reference's smi_augmenter applied ahead of time instead of per epoch,
    so featurization stays deterministic and the dataset can live in HBM).
    Consume with FeaturizeOptions(use_given_smiles_form=True)."""
    if variants <= 1:
        return list(records)
    rng = random.Random(seed)
    out: list[SampleRecord] = []
    for r in records:
        out.append(r)
        seen = {r.smiles}
        for v in range(variants - 1):
            rnd = chem.randomize(r.smiles, rng)
            if rnd is None or rnd in seen:
                continue
            seen.add(rnd)
            out.append(dataclasses.replace(r, sample_id=f"{r.sample_id}~{v+1}", smiles=rnd))
    return out
