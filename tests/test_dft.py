"""DFT/Gaussian legacy pipeline (sim/dft.py): Boltzmann averaging, shift
referencing, SDF conformer parsing, experimental-format loaders
(reference `nmr_calculation_from_dft_v15_4.py`)."""

from __future__ import annotations

import numpy as np
import pytest

from multimodalspectraltransformer_tpu.sim import dft


def _sdf_record(name, atoms, bonds, props):
    lines = [name, "  gen", "", f"{len(atoms):3d}{len(bonds):3d}  0  0  0  0  0  0  0  0999 V2000"]
    for sym in atoms:
        lines.append(f"    0.0000    0.0000    0.0000 {sym:<3} 0  0  0  0  0  0  0  0  0  0  0  0")
    for a1, a2, order in bonds:
        lines.append(f"{a1+1:3d}{a2+1:3d}{order:3d}  0")
    lines.append("M  END")
    for tag, val in props.items():
        lines.append(f"> <{tag}>")
        lines.append(str(val))
        lines.append("")
    lines.append("$$$$")
    return "\n".join(lines)


# methane-like fixture: 1 C + 2 H (toy), two conformers
ATOMS = ["C", "H", "H"]
BONDS = [(0, 1, 1), (0, 2, 1)]
SDF_TEXT = "\n".join([
    _sdf_record("conf1", ATOMS, BONDS, {
        "SCF Energy": "0.0",
        "atom.dprop.Isotropic sheilding": "180.0 30.0 30.5",
    }),
    _sdf_record("conf2", ATOMS, BONDS, {
        "SCF Energy": "1.0",  # 1 kcal/mol higher
        "atom.dprop.Isotropic sheilding": "170.0 29.0 29.5",
    }),
])


def test_boltzmann_weights():
    w = dft.boltzmann_weights(np.array([0.0, 1.0]))
    assert w.shape == (2,) and abs(w.sum() - 1.0) < 1e-12
    # 1 kcal/mol at 298 K -> population ratio exp(-1/0.5924) ~= 0.1845
    assert abs(w[1] / w[0] - np.exp(-1.0 / (dft.K_KCAL * dft.T_STD))) < 1e-12
    # invariant to absolute offset
    w2 = dft.boltzmann_weights(np.array([-500.0, -499.0]))
    assert np.allclose(w, w2)


def test_parse_and_average():
    confs = dft.load_conformer_set(SDF_TEXT)
    assert confs.atoms == ATOMS and len(confs.energies) == 2
    avg = dft.boltzmann_average(confs)
    w = dft.boltzmann_weights(confs.energies)
    assert abs(avg[0] - (w[0] * 180.0 + w[1] * 170.0)) < 1e-12
    # average sits between the conformer values, nearer the low-energy one
    assert 170.0 < avg[0] < 180.0 and avg[0] > 175.0


def test_shift_referencing():
    atoms = ["C", "H", "N"]
    sigma = np.array([160.0, 28.0, 50.0])
    shifts = dft.shifts_linear_scaling(atoms, sigma, slope_h=-1.05, intercept_h=31.8,
                                       slope_c=-1.04, intercept_c=186.5)
    assert abs(shifts[0] - (186.5 - 160.0) / 1.04) < 1e-12
    assert abs(shifts[1] - (31.8 - 28.0) / 1.05) < 1e-12
    assert shifts[2] == 50.0  # non-C/H untouched
    shifts2 = dft.shifts_solvent_reference(atoms, sigma, 190.0, 39.5, 31.0, 2.5)
    assert abs(shifts2[0] - (190.0 - 160.0 + 39.5)) < 1e-12
    assert abs(shifts2[1] - (31.0 - 28.0 + 2.5)) < 1e-12


def test_full_pipeline_and_hsqc():
    atoms, shifts = dft.run_dft_pipeline(SDF_TEXT, slope_h=-1.0, intercept_h=31.8,
                                         slope_c=-1.0, intercept_c=182.0)
    assert atoms == ATOMS
    assert shifts[0] == pytest.approx(182.0 - dft.boltzmann_average(dft.load_conformer_set(SDF_TEXT))[0])
    peaks = dft.hsqc_from_dft(ATOMS, BONDS, shifts)
    # both H bond to the same carbon -> one averaged peak
    assert len(peaks) == 1
    h, c = peaks[0]
    assert c == pytest.approx(shifts[0]) and h == pytest.approx((shifts[1] + shifts[2]) / 2)


def test_acd_loader(tmp_path):
    table = "\n".join([
        "F2 (ppm)\tF1 (ppm)\tF2 Atom",
        "2.10\t25.3\tH7",
        "3.52\t55.1\t<H9",
        "3.52\t55.1\t<H9",  # duplicate -> keep last
    ])
    text = _sdf_record("acd", ["C"], [], {"HSQC_13C-1H": table})
    p = tmp_path / "acd.sdf"
    p.write_text(text)
    peaks = dft.load_acd_hsqc(str(p))
    assert peaks.shape == (2, 3)
    assert peaks[1][2] == -1.0  # CH2 phase from '<'


def test_real_and_mnova_loaders(tmp_path):
    real = tmp_path / "real.txt"
    real.write_text("F2ppm F1ppm\n2.1 25.3\n3.5 55.1\n")
    arr = dft.load_real_hsqc(str(real))
    assert arr.shape == (2, 2) and arr[0][1] == 25.3
    mnova = tmp_path / "mnova.txt"
    mnova.write_text("1 2.1 25.3 1000\n2 3.5 55.1 900\n")
    arr2 = dft.load_mnova_hsqc(str(mnova))
    assert arr2.shape == (2, 2) and arr2[1][0] == 3.5
