"""Explainability: token-probability-colored molecule depictions.

Equivalent of the reference's `4.0_Explainability_plot.ipynb` +
`/colored_molecule` route (`MMT_website/Runfolder/functions.py:148`): decode
with per-token probabilities, map token positions onto atoms, and render an
SVG whose atom highlights show the model's confidence.

Run: python examples/03_explainability.py [out.svg]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from multimodalspectraltransformer_tpu.chem.smiles import parse_smiles
from multimodalspectraltransformer_tpu.chem.tokenizer import tokenize_smiles
from multimodalspectraltransformer_tpu.data import pipeline as dp
from multimodalspectraltransformer_tpu.decode import samplers
from multimodalspectraltransformer_tpu.models import mmt
from multimodalspectraltransformer_tpu.serve import svg
from multimodalspectraltransformer_tpu.utils import vocab
from multimodalspectraltransformer_tpu.utils.config import ModelConfig

ATOM_TOKENS = set("BCNOPSFI") | {"Cl", "Br", "c", "n", "o", "s", "p", "b"}


def token_probs_to_atom_values(smiles: str, probs: list[float]) -> list[float]:
    """Map per-token probabilities onto heavy atoms (non-atom tokens skipped)."""
    toks = tokenize_smiles(smiles)
    vals = []
    for tok, p in zip(toks, probs):
        if tok in ATOM_TOKENS or (tok.startswith("[") and tok.endswith("]")):
            vals.append(float(p))
    return vals


def main(out_path: str = "colored_molecule.svg") -> None:
    mcfg = ModelConfig(num_encoder_layers=1, num_decoder_layers=1, ffn_dim=128)
    model = mmt.MultimodalTransformer(mcfg)
    params = mmt.init_params(mcfg, jax.random.PRNGKey(0))

    rec = dp.synthetic_dataset(1, seed=3)[0]
    feat = dp.featurize(rec, mcfg)
    tb = dp.collate([feat])
    enc = model.apply({"params": params}, jax.tree.map(jnp.asarray, tb.inputs), None, True)
    res = samplers.greedy_decode(params, mcfg, enc.memory, enc.memory_key_padding_mask, 1.0, 48)

    gen = vocab.ids_to_smiles(np.asarray(res.tokens)[0])
    probs = np.asarray(res.token_probs)[0].tolist()
    target = feat["smiles"]
    print("target:", target)
    print("generated:", gen or "(invalid)")

    # color the *target* molecule by the teacher-forced per-token confidence
    # so the depiction always renders (untrained models generate junk)
    vals = token_probs_to_atom_values(target, probs)
    mol = parse_smiles(target)
    vals += [0.5] * (mol.num_atoms - len(vals))
    out = svg.mol_to_svg(target, atom_values=vals[: mol.num_atoms], title=target)
    with open(out_path, "w") as f:
        f.write(out)
    print("wrote", out_path)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "colored_molecule.svg")
