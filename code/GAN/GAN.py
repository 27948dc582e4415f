#!/usr/bin/env python
"""`python code/GAN/GAN.py` — the training entry point the reference README
promises (README.md:11) but never shipped (SURVEY.md §0 repo quirk: the repo
has no code/GAN/GAN.py; code/GAN/GAN_final.py is the canonical trainer).

Thin wrapper over the framework's training CLI; all flags pass through:
  python code/GAN/GAN.py --synthetic --steps 20
  python code/GAN/GAN.py --data /path/structure.json --log-dir runs/exp1
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from minipig_gan_tpu.cli.train import main

if __name__ == "__main__":
    main()
