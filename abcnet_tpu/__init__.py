"""abcnet_tpu — a TPU-native optical chemical structure recognition framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ABC-Net
(zhang-xuan1314/ABC-Net): synthetic molecular-image data generation,
CenterNet-style keypoint target encoding, a multi-head U-Net detector,
penalty-reduced focal training under learned uncertainty weighting,
mesh data-parallel training, batched on-device heatmap decoding, and a
host-side graph assembler emitting canonical SMILES.

Unlike the reference (PyTorch + RDKit + Indigo), this framework carries its
own chemistry core (`abcnet_tpu.chem`): SMILES parsing/canonicalization,
aromaticity perception & kekulization, V2000 MolBlock I/O and Morgan
fingerprints, so the full pipeline runs without external chemistry deps.
"""

__version__ = "0.1.0"
