"""Compute primitives: inits, conv/pool/norm, LSTM, losses, Pallas kernels."""
