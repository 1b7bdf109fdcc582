#!/usr/bin/env python
"""Reference-compatible entry point: python train.py [--model flownet2 ...].

Thin wrapper around tpureg.cli.train (see that module for the flag surface).
"""

from tpureg.cli.train import main

if __name__ == "__main__":
    main()
