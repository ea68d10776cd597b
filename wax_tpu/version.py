__version__ = "0.2.0"

# Single-file snapshot format version (see wax_tpu/storage/format.py).
SNAPSHOT_FORMAT_VERSION = 1
