#!/usr/bin/env python
"""Modern CLI entry (reference main.py parity): python main.py fit --config ..."""

from srtpu.cli import cli_main

if __name__ == '__main__':
    raise SystemExit(cli_main())
