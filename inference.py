#!/usr/bin/env python
"""Reference-compatible entry point: python inference.py [--model ...].

Thin wrapper around tpureg.cli.inference.
"""

from tpureg.cli.inference import main

if __name__ == "__main__":
    main()
