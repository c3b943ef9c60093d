"""TPU-native Multi-Modal Spectral Transformer framework.

A brand-new JAX / XLA / Pallas / pjit framework for automated molecular
structure elucidation from spectra, with the capabilities of the reference
PyTorch codebase mpriessner/MultiModalSpectralTransformer:

- per-modality spectral encoders (1H, 13C, HSQC, COSY, IR) + molecular
  formula / molecular weight / SMILES-hint conditioning, cross-modal fusion
  encoder and autoregressive SMILES decoder (``models.mmt``),
- KV-cached greedy / multinomial fan-out / beam decoding compiled to single
  XLA while-loops (``decode``),
- CLIP/BLIP contrastive spectrum<->SMILES ranking (``rank``),
- on-device simulated-data factory: JAX MPNN NMR-shift predictor and IR
  predictor plus 1H/13C/HSQC/COSY spectrum reconstruction (``sim``),
- batched spectral point-cloud matching incl. Hungarian assignment (``rank``),
- pjit/shard_map data-parallel training over a TPU mesh (``train``,
  ``parallel``),
- a first-party host-side chemistry stack (SMILES parsing, canonicalization,
  fingerprints) that does not require RDKit (``chem``).

Design is TPU-first: static shapes everywhere, batch-first layouts, modality
encoders stacked and vmapped so matmuls stay large on the MXU, and all hot
loops expressed as compiled lax control flow.
"""

__version__ = "0.1.0"
