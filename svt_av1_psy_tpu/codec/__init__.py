"""Codec algorithm layer (analog of the reference's Source/Lib/Codec L2)."""
