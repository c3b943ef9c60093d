"""Automatic NMR/IR data generation walkthrough.

Runnable-script equivalent of the reference's
`2.0_Automatic_NMR_Data_Generation.ipynb` + `3.0_Chemprop_IR_Data_Generation_.ipynb`:
SMILES -> predicted shifts -> 1H/13C/HSQC/COSY peak lists (+IR) -> reference-
format CSVs and SVG plots.

Run: python examples/01_data_generation.py [outdir]
"""

import os
import sys

from multimodalspectraltransformer_tpu.serve import plots
from multimodalspectraltransformer_tpu.sim import factory

SMILES = [
    "CC(C)Cc1ccc(C(C)C(=O)O)cc1",  # ibuprofen
    "CC(=O)Nc1ccc(O)cc1",          # paracetamol
    "O=C(O)c1ccccc1OC(C)=O",       # aspirin
    "c1ccc2c(c1)cccc2",            # naphthalene
]


def main(out_dir: str = "data_gen_out") -> None:
    os.makedirs(out_dir, exist_ok=True)

    # 1) simulate: filters + shift prediction + spectrum reconstruction,
    #    all in-process (no SDF/npz round trips)
    records = factory.simulate_records(SMILES)
    print(f"simulated {len(records)}/{len(SMILES)} molecules")

    # 2) export the reference CSV layout (sample-id, SMILES, shifts)
    paths = factory.export_reference_csvs(records, out_dir, run_id="demo")
    for modality, path in paths.items():
        print(f"  {modality}: {path}")

    # 3) plot each modality of the first molecule as standalone SVG
    rec = records[0]
    for modality in ("1H", "13C", "HSQC", "COSY"):
        svg = plots.plot_record(rec, modality)
        if svg:
            path = os.path.join(out_dir, f"{modality}.svg")
            with open(path, "w") as f:
                f.write(svg)
            print(f"  plot: {path}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "data_gen_out")
