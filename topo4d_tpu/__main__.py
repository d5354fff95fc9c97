"""``python -m topo4d_tpu`` == ``python -m topo4d_tpu.cli``."""

from topo4d_tpu.cli import main

if __name__ == "__main__":
    main()
