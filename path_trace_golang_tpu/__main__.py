"""``python -m path_trace_golang_tpu`` == the reference CLI."""

import sys

from .cli import main

sys.exit(main())
