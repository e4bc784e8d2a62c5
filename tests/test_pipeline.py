"""Data pipeline tests: device preprocessing parity + batch plumbing."""

import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from abcnet_tpu.data import pipeline
from abcnet_tpu.data.generate import generate_sample


def test_device_preprocess_matches_host_binarize():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2, 64, 64), dtype=np.uint8)
    out = pipeline.device_preprocess(jnp.asarray(img), jax.random.PRNGKey(0),
                                     train=False)
    expect = ((img.astype(np.float32) / 255.0) < 0.6).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(out)[..., 0], expect)


def test_device_preprocess_noise_bounds():
    img = np.full((4, 64, 64), 255, np.uint8)  # all white -> no ink
    out = pipeline.device_preprocess(jnp.asarray(img), jax.random.PRNGKey(1),
                                     amount=0.5, train=True)
    frac = float(np.asarray(out).mean())
    # Only salt noise can appear, at rate < amount/100 = 0.005 per image.
    assert 0.0 <= frac < 0.01


def test_sample_to_example_and_collate():
    rng = random.Random(3)
    examples = []
    while len(examples) < 3:
        s = generate_sample(rng)
        if s is not None:
            examples.append(pipeline.sample_to_example(s, rng, train=True))
    batch = pipeline.collate(examples)
    assert batch["image_bits"].shape == (3, 512, 512 // 8)
    assert batch["image_bits"].dtype == np.uint8
    assert batch["atoms"].shape[1:] == (96, 5)
    assert batch["bonds_i"].shape[1:] == (112, 4)
    assert (batch["n_atoms"] > 0).all()
    assert (batch["n_bonds"] > 0).all()
    # Label coordinates land on the stride-4 grid.
    for i in range(3):
        n = batch["n_atoms"][i]
        assert (batch["atoms"][i, :n, :2] >= 0).all()
        assert (batch["atoms"][i, :n, :2] < 128).all()


def test_geometric_augment_rescales_labels_consistently():
    rng = random.Random(11)
    sample = None
    while sample is None:
        sample = generate_sample(rng)
    # Force the rescale branch by trying seeds until scale != 1.
    for seed in range(50):
        r = random.Random(seed)
        img, p = pipeline._geometric_augment(sample.image, r, train=True)
        if p.scale_x != 1.0 or p.scale_y != 1.0:
            assert img.shape == (512, 512)
            assert p.ddx >= 0 and p.ddy >= 0
            break
    else:
        pytest.fail("rescale branch never taken in 50 seeds")


def test_batches_from_examples_drop_remainder():
    rng = random.Random(5)
    examples = []
    while len(examples) < 5:
        s = generate_sample(rng)
        if s is not None:
            examples.append(pipeline.sample_to_example(s, rng, train=False))
    batches = list(pipeline.batches_from_examples(examples, 2, seed=0))
    assert len(batches) == 2
    assert all(b["image_bits"].shape[0] == 2 for b in batches)


def test_prefetch_iterator_preserves_items():
    it = pipeline.PrefetchIterator(iter(range(10)), depth=2)
    assert list(it) == list(range(10))


def test_synthetic_batch_sizes():
    b = pipeline.synthetic_batch(2, size=128)
    assert b["image_bits"].shape == (2, 128, 128 // 8)
    assert (b["atoms"][:, :24, :2] < 32).all()


def test_pack_unpack_bits_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (2, 64, 64), dtype=np.uint8)
    bits = pipeline.pack_images(img, threshold=0.6)
    out = pipeline.device_unpack_bits(jnp.asarray(bits),
                                      jax.random.PRNGKey(0), train=False)
    expect = ((img.astype(np.float32) / 255.0) < 0.6).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(out)[..., 0], expect)


def test_otsu_threshold_separates_bimodal():
    from abcnet_tpu.data.binarize import (binarize_otsu, otsu_threshold,
                                          otsu_threshold_jax)
    rng = np.random.default_rng(0)
    img = np.where(rng.random((64, 64)) < 0.3,
                   rng.integers(0, 60, (64, 64)),
                   rng.integers(200, 256, (64, 64))).astype(np.uint8)
    t = otsu_threshold(img)
    # any threshold from the top of the dark class through the gap
    # separates the modes; Otsu returns the first maximizer
    assert 55 <= t < 200
    tj = int(otsu_threshold_jax(jnp.asarray(img)))
    assert abs(tj - t) <= 1
    mask = binarize_otsu(img)
    assert 0.25 < mask.mean() < 0.35


def test_corpus_rendering_faithful_stereo(tmp_path):
    """gen --smiles-csv role: a given SMILES renders to a sample whose
    ground truth matches the input, including depicted tetrahedral
    stereo (rdkit_img_generate.py:219-246 renders an input corpus)."""
    import random

    from abcnet_tpu.chem import canonical_smiles
    from abcnet_tpu.data.generate import generate_sample

    corpus = ["C[C@H](N)C(=O)O", "CC(=O)Oc1ccccc1C(=O)O",
              "C[C@@H](O)[C@H](N)CO"]
    for smi in corpus:
        want = canonical_smiles(smi)
        got = None
        for seed in range(6):   # crowded layouts may reject; retry
            s = generate_sample(random.Random(seed), mode="rdkit",
                                smiles=smi)
            if s is not None:
                got = s.smiles
                break
        assert got is not None, smi
        assert canonical_smiles(got, isomeric=False) == \
            canonical_smiles(smi, isomeric=False), smi
        if "@" in want:
            assert canonical_smiles(got) == want, smi


def test_generate_dataset_from_corpus_and_plain_csv(tmp_path):
    import pandas as pd

    from abcnet_tpu.data.generate import generate_dataset

    corpus = ["CCO", "c1ccccc1", "CC(C)CC(N)=O", "not_a_smiles((("]
    df = generate_dataset(str(tmp_path / "ds"), 0, mode="rdkit",
                          smiles_list=corpus, verbose=False)
    assert 3 <= len(df) <= 4          # the garbage row is skipped
    # plain (image, smiles) CSV — UOB-shape ingestion
    plain = pd.DataFrame({"smiles": list(df["Smiles"]),
                          "image": list(df["path"])})
    plain_csv = tmp_path / "ds" / "plain.csv"
    plain.to_csv(plain_csv, index=False)
    samples = pipeline.load_inference_csv(str(plain_csv))
    assert len(samples) == len(df)
    assert samples[0].image.shape == (512, 512)
    assert samples[0].atoms_string == ""


def test_ez_roundtrip_through_decode():
    """Drawn double-bond geometry is perceived symmetrically: GT and
    perfect-target decode agree on cis/trans (RDKit MolFromMolBlock
    perception role on both sides)."""
    import random

    from abcnet_tpu.chem import canonical_smiles
    from abcnet_tpu.data.encode import (encode_targets_np,
                                        parse_atoms_string,
                                        parse_bonds_string)
    from abcnet_tpu.data.generate import generate_sample
    from abcnet_tpu.infer import assemble_batch, extract_peaks
    from abcnet_tpu.utils.diagnostics import fake_logits_from_targets

    checked = 0
    for seed in range(40):
        s = generate_sample(random.Random(seed), mode="rdkit",
                            smiles="CC/C=C/C(Br)CN")
        if s is None:
            continue
        targets = encode_targets_np(parse_atoms_string(s.atoms_string),
                                    parse_bonds_string(s.bonds_string))
        peaks = extract_peaks(fake_logits_from_targets(targets))
        pred = assemble_batch(peaks)[0]
        assert pred is not None
        assert canonical_smiles(pred) == canonical_smiles(s.smiles)
        if "/" in s.smiles or "\\" in s.smiles:
            checked += 1
        if checked >= 3:
            break
    assert checked >= 3   # the depiction carries E/Z and decode kept it
