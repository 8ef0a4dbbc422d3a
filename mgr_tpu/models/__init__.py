"""Model families: speech, skeletal, rgb, early_fusion, late_fusion.

All five are wired from one shared residual-BLSTM encoder block plus a
CNN frontend for video — the factorization the reference copy-pasted
five times (SURVEY.md §1 "key structural fact")."""

from mgr_tpu.models.zoo import ModelDef, build_model  # noqa: F401

__all__ = ["ModelDef", "build_model"]
