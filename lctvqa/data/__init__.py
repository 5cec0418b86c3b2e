"""Data: offline builders (vocab, npy, hdf5), synthetic fixtures, and the
host->HBM input pipeline."""
