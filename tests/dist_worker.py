"""One process of a multi-process CPU training run (test_distributed).

Not a test — launched as ``python tests/dist_worker.py <out.json>
[key=value ...]`` by ``test_two_process_cpu_launch`` with the distributed
topology in env (A2M_COORDINATOR / A2M_NUM_PROCESSES / A2M_PROCESS_ID) and
``XLA_FLAGS=--xla_force_host_platform_device_count=N`` for virtual local
devices.  Drives the REAL CLI entry (`a2m.train.__main__.main`) so the
bootstrap, loader process-slicing, and Trainer mesh wiring are all the
production path; the only instrumentation is a Trainer.fit wrapper that
dumps the loss history to ``out.json`` afterwards.
"""

import faulthandler
import json
import os
import pathlib
import signal
import sys

faulthandler.register(signal.SIGUSR1)   # kill -USR1 <pid> dumps all stacks

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

# Force CPU even when a sitecustomize pre-imports jax pinned to a TPU
# platform (same mechanism as tests/conftest.py), and reuse the suite's
# persistent compile cache so warm runs skip the GAN-step compiles.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('A2M_TEST_COMPILE_CACHE',
                                 '/tmp/a2m_jax_test_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

import numpy as np  # noqa: E402


def main() -> None:
    out_path = sys.argv[1]
    overrides = sys.argv[2:]

    from a2m.train import __main__ as train_main
    from a2m.train.loop import Trainer

    orig_fit = Trainer.fit

    def fit_and_dump(self, *a, **k):
        hist = orig_fit(self, *a, **k)
        payload = dict(
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            local_devices=jax.local_device_count(),
            global_devices=jax.device_count(),
            train_batches=len(self.dataloader.train),
            dev_batches=len(self.dataloader.dev),
            g_loss_history=[float(x)
                            for x in self.controller.g_loss_history],
            d_loss_history=[float(x)
                            for x in self.controller.d_loss_history],
            val_g=[float(x) for x in hist['val_g']],
            val_d=[float(x) for x in hist['val_d']],
            mean=np.asarray(self.mean).tolist(),
            std=np.asarray(self.std).tolist(),
        )
        pathlib.Path(out_path).write_text(json.dumps(payload))
        return hist

    Trainer.fit = fit_and_dump
    train_main.main(overrides)


if __name__ == '__main__':
    main()
