"""Subprocess victim for the kill-during-save atomicity sweep
(tests/test_ckpt_atomicity.py). Writes round 1 (all leaves 1.0) normally,
then starts round 2 (all leaves 2.0) with a TCVAE_CKPT_TEST_PAUSE crash
window at the pause point given in argv — the parent SIGKILLs this process
the moment the pause marker prints. Not a pytest module (no test_ prefix)."""

import os
import sys

os.environ.setdefault("TCVAE_PLATFORM", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def tree(v: float) -> dict:
    return {"encoder": {"w": np.full((8, 8), v, np.float32)},
            "decoder": {"w": np.full((8, 8), v, np.float32)}}


def opt(v: float) -> dict:
    return {"count": np.full((), int(v), np.int32),
            "mu": np.full((8, 8), v, np.float32)}


def main() -> None:
    log_dir, pause_point = sys.argv[1], sys.argv[2]
    from trustedai_cl_vae_ad_tpu.train.checkpoint import (
        AsyncSaver,
        save_checkpoint,
    )

    save_checkpoint(log_dir, tree(1.0), opt_state=opt(1.0))
    print("ROUND1-DONE", flush=True)
    if pause_point == "async_inflight":
        # round 2 via the async path, killed while the background write is
        # in flight (before wait() ever commits): bulky leaves keep the
        # write going while the parent kills us — but the assertion holds
        # REGARDLESS of write completion, because an uncommitted round is
        # never selected by restore
        import numpy as np

        big = {"encoder": {"w": np.full((2048, 2048), 2.0, np.float32)},
               "decoder": {"w": np.full((2048, 2048), 2.0, np.float32)}}
        saver = AsyncSaver()
        saver.save(log_dir, big)
        print("ASYNC-STARTED", flush=True)
        import time

        time.sleep(30)  # parent SIGKILLs here
        return
    os.environ["TCVAE_CKPT_TEST_PAUSE"] = f"{pause_point}:30"
    save_checkpoint(log_dir, tree(2.0), opt_state=opt(2.0))
    print("ROUND2-DONE", flush=True)


if __name__ == "__main__":
    main()
