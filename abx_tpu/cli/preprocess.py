"""Thin shim mirroring the reference's preprocess_data.py entry point."""
from abx_tpu.preprocess.make_data import main

if __name__ == '__main__':
    main()
