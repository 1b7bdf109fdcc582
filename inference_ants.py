#!/usr/bin/env python
"""Reference-compatible entry point: python inference_ants.py [...].

Thin wrapper around tpureg.cli.inference_ants (classical comparator; uses
ANTsPy when installed, the TPU-native SVF registration otherwise).
"""

from tpureg.cli.inference_ants import main

if __name__ == "__main__":
    main()
