"""Engine B (stroke-font scanline renderer) tests.

The second drawing program must honor the same dataset contract as
engine A (RenderResult fields, rejection rules, label-record
consistency) while producing a genuinely different pixel distribution —
the role of the reference's second renderer (indigo_img_generator.py
vs rdkit_img_generate.py)."""

import random

import numpy as np

from abcnet_tpu.chem import from_smiles, perceive_aromaticity
from abcnet_tpu.data.generate import generate_sample
from abcnet_tpu.data.layout import layout
from abcnet_tpu.data.raster2 import Canvas2, GLYPHS, stroke_text_size
from abcnet_tpu.data.render import RenderStyle, render
from abcnet_tpu.data.render2 import RenderStyleB, render_b
from abcnet_tpu.data.vocab import ATOM_VOCAB


def test_glyphs_cover_vocab_and_draw_ink():
    needed = set("0123456789+-()H")
    for sym in ATOM_VOCAB:
        if sym.startswith("<"):
            continue
        needed.update(sym)
    missing = sorted(ch for ch in needed if ch not in GLYPHS)
    assert not missing, f"stroke font missing glyphs: {missing}"
    for ch in sorted(needed):
        cv = Canvas2(48, aa=1.0)
        cv.stroke_text(ch, (40, 8), 28, 2.0)
        img = cv.to_array()
        assert (img < 128).sum() > 10, f"glyph {ch!r} drew no ink"
        w, h = stroke_text_size(ch, 28)
        assert w > 0 and h == 28


def _mol_and_coords(smiles, seed=3):
    mol = from_smiles(smiles)
    perceive_aromaticity(mol)
    coords = layout(mol, random.Random(seed))
    return mol, coords


def test_render_b_contract():
    mol, coords = _mol_and_coords("CC(=O)Oc1ccccc1C(=O)O")
    style = RenderStyleB(size=512, rotation=0.4)
    res = render_b(mol, coords, style, random.Random(0))
    assert res is not None
    img = res.image
    assert img.shape == (512, 512) and img.dtype == np.uint8
    # White background at the corners, ink somewhere.
    assert img[0, 0] == 255 and img[-1, -1] == 255
    assert (img < 128).sum() > 300
    assert len(res.atom_rc) == mol.num_atoms
    rows = [r for r, _ in res.atom_rc]
    cols = [c for _, c in res.atom_rc]
    assert min(rows) > 4 and max(rows) < 508
    assert min(cols) > 4 and max(cols) < 508
    assert res.bond_px > 20


def test_engines_differ_on_same_molecule_and_layout():
    mol, coords = _mol_and_coords("CC(=O)Nc1ccc(O)cc1")
    res_a = render(mol, coords, RenderStyle(size=512, rotation=1.1),
                   random.Random(0))
    res_b = render_b(mol, coords, RenderStyleB(size=512, rotation=1.1),
                     random.Random(0))
    assert res_a is not None and res_b is not None
    a = res_a.image.astype(np.int16)
    b = res_b.image.astype(np.int16)
    ink_union = ((a < 128) | (b < 128)).sum()
    disagree = ((a < 128) != (b < 128)).sum()
    # Same molecule, same layout — but a large share of ink pixels must
    # disagree (different stroke/glyph program), not a near-identical
    # restyle.
    assert disagree / ink_union > 0.25


def test_aromatic_circles_drawn():
    mol, coords = _mol_and_coords("c1ccccc1")
    style = RenderStyleB(size=512, rotation=0.0, label_mode="hetero")
    plain = render_b(mol, coords, style, random.Random(0),
                     aromatic_render=False)
    circ = render_b(mol, coords, style, random.Random(0),
                    aromatic_render=True)
    assert plain is not None and circ is not None
    # The circle adds ink strictly inside the ring (away from the
    # kekulized double-bond inner lines, which aromatic_render removes).
    rows = [r for r, _ in circ.atom_rc]
    cols = [c for _, c in circ.atom_rc]
    rc, cc = np.mean(rows), np.mean(cols)
    rad = np.mean([np.hypot(r - rc, c - cc)
                   for r, c in zip(rows, cols)])
    yy, xx = np.mgrid[0:512, 0:512]
    ring_zone = (np.hypot(yy - rc, xx - cc) < rad * 0.75)
    assert (circ.image[ring_zone] < 128).sum() > \
        (plain.image[ring_zone] < 128).sum()


def test_generate_sample_engine_b_encodes():
    from abcnet_tpu.data.encode import (encode_targets_np,
                                        parse_atoms_string,
                                        parse_bonds_string)
    rng = random.Random(11)
    got = 0
    for _ in range(12):
        s = generate_sample(rng, mode="mixed", engine="b")
        if s is None:
            continue
        got += 1
        t = encode_targets_np(parse_atoms_string(s.atoms_string),
                              parse_bonds_string(s.bonds_string))
        assert t["atom_target"].max() == 1.0
        assert t["bond_target"].max() == 1.0
        assert s.smiles
    assert got >= 6


def test_engine_mix_produces_both():
    rng = random.Random(5)
    # Deterministic: the coin flip is taken from rng inside
    # generate_sample; just check both engines appear over a run by
    # rendering the same seed with engine fixed and comparing members.
    imgs = {"a": [], "b": []}
    for eng in ("a", "b"):
        r = random.Random(5)
        for _ in range(4):
            s = generate_sample(r, mode="rdkit", engine=eng)
            if s is not None:
                imgs[eng].append(s.image)
    assert imgs["a"] and imgs["b"]
    mixed = []
    r = random.Random(5)
    for _ in range(6):
        s = generate_sample(r, mode="rdkit", engine="mix")
        if s is not None:
            mixed.append(s.image)
    assert len(mixed) >= 3
