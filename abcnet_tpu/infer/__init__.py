from .decode import extract_peaks, DecodeConfig
from .assemble import assemble_smiles, assemble_batch

__all__ = ["extract_peaks", "DecodeConfig", "assemble_smiles",
           "assemble_batch"]
