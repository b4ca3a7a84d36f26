#!/usr/bin/env python
"""Runnable alias honoring the reference CLI contract
(``python visual_mpc/sim/run.py <hparams.py> ...``).

Module imports of ``visual_mpc.sim.run`` resolve through the compat
meta-path finder in ``visual_mpc/__init__.py``; this file only exists so the
literal script invocation works too.
"""

from visual_foresight_tpu.sim.run import main

if __name__ == '__main__':
    main()
