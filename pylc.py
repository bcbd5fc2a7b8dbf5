#!/usr/bin/env python3
"""PyLC-TPU application entry point.

Drop-in CLI for the reference's ``pylc.py`` (same subcommands and flag
spellings; see pylc_tpu/cli.py).
"""

from pylc_tpu.cli import main

if __name__ == "__main__":
    main()
