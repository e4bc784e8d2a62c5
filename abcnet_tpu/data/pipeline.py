"""Training/eval data pipeline: host generation -> device preprocessing.

TPU-first redesign of the reference's DataLoader path
(/root/reference/src/train.py:44-45, src/utils.py:36-251):

  * The reference's CPU workers binarize, add noise, and materialize
    ~24 MB of dense targets per sample. Here host workers only render
    (or read) the uint8 image, apply the geometric augmentation (the
    one transform that moves labels, src/utils.py:47-61) and emit
    compact integer labels; everything else happens on device.
  * Images ship to the device as uint8 (4x less PCIe/DMA traffic than
    float32); thresholding at 0.6 and salt/pepper noise
    (src/utils.py:63-80) run inside XLA (`device_preprocess`).
  * Dense CenterNet targets are scatter-built in XLA from the compact
    labels (ops/targets.py) — the host never touches them.

Three sources: `generate_epoch` (on-the-fly random molecules),
`load_csv_dataset` (disk tree parity with the reference CSV format),
and `synthetic_batch` (random pixels, for benchmarks).
"""

from __future__ import annotations

import os
import queue
import random
import threading
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import raster, vocab
from .augment import AugmentParams
from .encode import (MAX_ATOMS, MAX_BONDS, compact_labels,
                     parse_atoms_string, parse_bonds_string)
from .generate import Sample, generate_sample

SIZE = 512


@dataclass
class Example:
    """One host-side training example: uint8 canvas + compact labels."""
    image_u8: np.ndarray          # (512, 512) uint8, white background
    labels: Dict[str, np.ndarray]
    smiles: str = ""


def _geometric_augment(img_u8: np.ndarray, rng: random.Random,
                       train: bool, size: int = SIZE) -> (np.ndarray, AugmentParams):
    """20%: one axis rescaled by U(0.8, 1), re-center-pad with white
    (reference src/utils.py:47-61). Returns uint8 canvas + params used
    to transform label coordinates."""
    scale_x = scale_y = 1.0
    temp = img_u8
    if train and rng.random() < 0.2:
        if rng.random() < 0.5:
            scale_x = rng.uniform(0.8, 1.0)
            temp = raster.resize(temp, (int(scale_x * size), size))
        else:
            scale_y = rng.uniform(0.8, 1.0)
            temp = raster.resize(temp, (size, int(scale_y * size)))
    ddx = (size - temp.shape[0]) // 2
    ddy = (size - temp.shape[1]) // 2
    if temp.shape != (size, size):
        canvas = np.full((size, size), 255, np.uint8)
        canvas[ddx:ddx + temp.shape[0], ddy:ddy + temp.shape[1]] = temp
    else:
        canvas = temp
    return canvas, AugmentParams(scale_x, scale_y, ddx, ddy)


def sample_to_example(sample: Sample, rng: random.Random,
                      train: bool = True,
                      degrade_p: float = 0.0,
                      degrade_hard: bool = False) -> Example:
    """degrade_p > 0 applies one scan-style degradation (blur / erode /
    downscale / JPEG, data/degrade.py) to that fraction of training
    images — after the geometric augment, before binarization; label
    coordinates are unaffected. Default 0 keeps the reference's
    salt/pepper-only training recipe (src/utils.py:73-80).
    degrade_hard=True draws from the hard-tail regime (blur/erode
    biased — the robustness fine-tune; see degrade.random_degrade)."""
    img, p = _geometric_augment(sample.image, rng, train)
    if train and degrade_p > 0 and rng.random() < degrade_p:
        from .degrade import random_degrade
        img = random_degrade(img, rng, hard=degrade_hard)
    atoms = parse_atoms_string(sample.atoms_string)
    bonds = parse_bonds_string(sample.bonds_string)
    labels = compact_labels(atoms, bonds, p.scale_x, p.scale_y,
                            p.ddx, p.ddy)
    return Example(img, labels, sample.smiles)


def pack_images(images_u8: np.ndarray, threshold: float = 0.6) -> np.ndarray:
    """Binarize (ink = gray/255 < threshold, utils.py:63) and bit-pack
    along the column axis: (B, H, W) uint8 -> (B, H, W//8) uint8.

    1 bit/pixel instead of 8 is an 8x smaller host->device transfer —
    and, with the axon tunnel retaining a staging buffer per transfer
    (observed ~batch-size bytes leaked per step), the difference between
    a multi-hour run and an OOM kill.
    """
    # Exact-parity fast path: the reference predicate gray/255 < t is
    # monotone in the uint8 value, so it equals x < cutoff where cutoff
    # is derived by evaluating the ORIGINAL f32 predicate over all 256
    # byte values — no 512x512xB float temp (85% of warm collate time).
    lut = (np.arange(256, dtype=np.uint8).astype(np.float32)
           / 255.0) < threshold
    cutoff = int(lut.sum())
    if cutoff <= 0:
        ink = np.zeros(images_u8.shape, bool)
    elif cutoff >= 256:
        ink = np.ones(images_u8.shape, bool)
    else:
        ink = images_u8 < np.uint8(cutoff)
    return np.packbits(ink, axis=-1)


def collate(examples: Sequence[Example],
            threshold: float = 0.6) -> Dict[str, np.ndarray]:
    """Stack host examples into one batch dict (bit-packed images)."""
    return {
        "image_bits": pack_images(
            np.stack([e.image_u8 for e in examples]), threshold),
        "atoms": np.stack([e.labels["atoms"] for e in examples]),
        "n_atoms": np.stack([e.labels["n_atoms"] for e in examples]),
        "bonds_i": np.stack([e.labels["bonds_i"] for e in examples]),
        "bonds_f": np.stack([e.labels["bonds_f"] for e in examples]),
        "n_bonds": np.stack([e.labels["n_bonds"] for e in examples]),
    }


def _apply_noise(ink, key: jax.Array, amount: float):
    """Salt/pepper parity with reference src/utils.py:73-80: salt rate
    ~ U(0, amount/100) per image adds ink; pepper ~ U(0, amount)."""
    b = ink.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    salt_rate = jax.random.uniform(k1, (b, 1, 1)) * (amount / 100.0)
    pepper_rate = jax.random.uniform(k2, (b, 1, 1)) * amount
    salt = jax.random.uniform(k3, ink.shape) < salt_rate
    pepper = jax.random.uniform(k4, ink.shape) < pepper_rate
    return jnp.logical_and(jnp.logical_or(ink, salt),
                           jnp.logical_not(pepper))


def device_preprocess(image_u8: jnp.ndarray, key: jax.Array,
                      amount: float = 0.2,
                      train: bool = True,
                      threshold: float = 0.6) -> jnp.ndarray:
    """uint8 batch -> float32 foreground mask (B, H, W, 1), in XLA.

    Parity with reference src/utils.py:63-80: ink = gray/255 < 0.6,
    then salt/pepper noise.
    """
    ink = (image_u8.astype(jnp.float32) / 255.0) < threshold
    if train and amount > 0:
        ink = _apply_noise(ink, key, amount)
    return ink.astype(jnp.float32)[..., None]


def device_unpack_bits(image_bits: jnp.ndarray, key: jax.Array,
                       amount: float = 0.2,
                       train: bool = True,
                       use_pallas: bool = False) -> jnp.ndarray:
    """Bit-packed batch (B, H, W//8) -> float32 mask (B, H, W, 1).

    The binarize threshold was applied at pack time (pack_images);
    salt/pepper noise still runs in XLA. use_pallas=True routes through
    the fused Pallas kernel (ops/pallas_input.py): one pass per image,
    bf16 output (upcast here for caller-dtype parity), hardware PRNG
    for the per-pixel noise bits — rate distributions identical, noise
    stream not (documented there).
    """
    if use_pallas:
        from ..ops.pallas_input import fused_unpack_noise
        return fused_unpack_noise(image_bits, key, amount=amount,
                                  train=train).astype(jnp.float32)
    b, h, wb = image_bits.shape
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)    # MSB-first
    bits = (image_bits[..., None] >> shifts) & jnp.uint8(1)
    ink = bits.reshape(b, h, wb * 8) > 0
    if train and amount > 0:
        ink = _apply_noise(ink, key, amount)
    return ink.astype(jnp.float32)[..., None]


# ---------------------------------------------------------------------------
# Sources
# ---------------------------------------------------------------------------

def generate_examples(n: int, seed: int = 0, mode: str = "mixed",
                      train: bool = True,
                      processes: Optional[int] = None) -> List[Example]:
    """Generate n examples, fanned out over a process pool (the
    reference's dataloader-worker role, train.py:44)."""
    if processes is None:
        processes = max(1, (os.cpu_count() or 4) - 2)
    if processes <= 1 or n < 32:
        rng = random.Random(seed)
        return [_gen_one(rng, mode, train) for _ in range(n)]
    # spawn, not fork: the parent may hold a live TPU client whose
    # mutexes make forked children deadlock-prone.
    import multiprocessing as mp
    chunk = (n + processes - 1) // processes
    args = [(seed + 7919 * w, min(chunk, n - w * chunk), mode, train)
            for w in range(processes) if w * chunk < n]
    with mp.get_context("spawn").Pool(len(args)) as pool:
        parts = pool.starmap(_gen_chunk, args)
    return [e for part in parts for e in part]


def _gen_one(rng: random.Random, mode: str, train: bool) -> Example:
    while True:
        s = generate_sample(rng, mode=mode)
        if s is not None:
            return sample_to_example(s, rng, train)


def _gen_chunk(seed: int, n: int, mode: str, train: bool) -> List[Example]:
    rng = random.Random(seed)
    return [_gen_one(rng, mode, train) for _ in range(n)]


def load_csv_dataset(csv_path: str, image_root: Optional[str] = None
                     ) -> List[Sample]:
    """Read a reference-format CSV (Smiles/atoms_string/bonds_string/path)
    + PNG tree back into Samples (parity: src/utils.py:36-42)."""
    import pandas as pd
    df = pd.read_csv(csv_path)
    root = image_root or os.path.dirname(csv_path)
    out = []
    for row in df.itertuples():
        img = raster.imread_gray(os.path.join(root, row.path))
        out.append(Sample(img, row.atoms_string, row.bonds_string,
                          row.Smiles))
    return out


def load_inference_csv(csv_path: str, image_root: Optional[str] = None,
                       size: int = SIZE) -> List[Sample]:
    """(image, smiles)-only ingestion for real-world benchmark decoding
    — the reference's UOB path (src/utils_for_test.py:8-38,
    img2smiles2.py:36-40), which needs no label columns. Images are
    resized to size x size like the reference's test dataset. Column
    names are auto-detected (SMILES among Smiles/smiles/SMILES;
    image path among path/file/filename/image/image_path)."""
    import pandas as pd
    df = pd.read_csv(csv_path)
    cols = {c.lower(): c for c in df.columns}
    smi_col = next((cols[k] for k in ("smiles",) if k in cols), None)
    img_col = next((cols[k] for k in
                    ("path", "file", "filename", "image", "image_path")
                    if k in cols), None)
    if smi_col is None or img_col is None:
        raise ValueError(
            f"need a SMILES and an image-path column; got {list(df.columns)}")
    root = image_root or os.path.dirname(csv_path)
    out = []
    for _, row in df.iterrows():
        img = raster.imread_gray(os.path.join(root, str(row[img_col])))
        if img.shape != (size, size):
            img = raster.resize(img, (size, size))
        out.append(Sample(img, "", "", str(row[smi_col])))
    return out


def batches_from_samples(samples: Sequence[Sample], batch_size: int,
                         seed: int = 0, epoch: int = 0,
                         train: bool = True,
                         drop_remainder: bool = True,
                         degrade_p: float = 0.0
                         ) -> Iterator[Dict[str, np.ndarray]]:
    """Per-epoch batches with FRESH augmentation — the reference's
    dataloader re-runs __getitem__ (and so the random rescale/pad)
    every epoch (utils.py:47-61); pre-converting samples to examples
    would freeze one augmentation forever."""
    rng = random.Random(seed * 1_000_003 + epoch)
    order = np.random.default_rng(seed + epoch).permutation(len(samples))
    stop = len(order) - batch_size + 1 if drop_remainder else len(order)
    for i in range(0, max(stop, 0), batch_size):
        ex = [sample_to_example(samples[j], rng, train=train,
                                degrade_p=degrade_p)
              for j in order[i:i + batch_size]]
        yield collate(ex)


def batches_from_examples(examples: Sequence[Example], batch_size: int,
                          seed: int = 0, shuffle: bool = True,
                          drop_remainder: bool = True
                          ) -> Iterator[Dict[str, np.ndarray]]:
    idx = np.arange(len(examples))
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    stop = len(idx) - batch_size + 1 if drop_remainder else len(idx)
    for i in range(0, max(stop, 0), batch_size):
        chunk = [examples[j] for j in idx[i:i + batch_size]]
        yield collate(chunk)


class PrefetchIterator:
    """Background-thread prefetch of host batches (the reference's
    prefetch_factor=10, train.py:45)."""

    def __init__(self, it: Iterator, depth: int = 4):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._sentinel = object()
        self._thread = threading.Thread(target=self._fill, args=(it,),
                                        daemon=True)
        self._thread.start()

    def _fill(self, it):
        try:
            for item in it:
                self._q.put(item)
        finally:
            self._q.put(self._sentinel)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._sentinel:
            raise StopIteration
        return item


def synthetic_batch(batch_size: int, seed: int = 0,
                    size: int = SIZE) -> Dict[str, np.ndarray]:
    """Random-pixel batch with plausible labels, for benchmarks and
    compile checks (no host generation cost)."""
    rng = np.random.default_rng(seed)
    grid = size // vocab.STRIDE
    n_atoms = 24
    n_bonds = 48
    atoms = np.zeros((batch_size, MAX_ATOMS, 5), np.int32)
    atoms[:, :n_atoms, 0] = rng.integers(2, grid - 2, (batch_size, n_atoms))
    atoms[:, :n_atoms, 1] = rng.integers(2, grid - 2, (batch_size, n_atoms))
    atoms[:, :n_atoms, 2] = rng.integers(1, 4, (batch_size, n_atoms))
    atoms[:, :n_atoms, 4] = -1
    bonds_i = np.zeros((batch_size, MAX_BONDS, 4), np.int32)
    bonds_i[:, :n_bonds, 0] = rng.integers(2, grid - 2, (batch_size, n_bonds))
    bonds_i[:, :n_bonds, 1] = rng.integers(2, grid - 2, (batch_size, n_bonds))
    bonds_i[:, :n_bonds, 3] = rng.integers(0, 60, (batch_size, n_bonds))
    bonds_f = np.zeros((batch_size, MAX_BONDS, 1), np.float32)
    bonds_f[:, :n_bonds, 0] = rng.uniform(2, 8, (batch_size, n_bonds))
    return {
        "image_bits": pack_images(
            rng.integers(0, 256, (batch_size, size, size),
                         dtype=np.uint8)),
        "atoms": atoms,
        "n_atoms": np.full((batch_size,), n_atoms, np.int32),
        "bonds_i": bonds_i,
        "bonds_f": bonds_f,
        "n_bonds": np.full((batch_size,), n_bonds, np.int32),
    }
