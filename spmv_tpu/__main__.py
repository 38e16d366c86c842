"""python -m spmv_tpu — the CLI driver (see spmv_tpu.cli)."""

import sys

from spmv_tpu.cli import main

sys.exit(main())
