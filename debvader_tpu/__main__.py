"""``python -m debvader_tpu`` — see debvader_tpu/cli.py."""

import sys

from debvader_tpu.cli import main

sys.exit(main())
