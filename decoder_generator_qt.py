#!/usr/bin/env python3
"""Decoder explorer: hand-set latent vector -> decoded image.

Parity with reference decoder_generator_qt.py:68-408: loads a model log dir,
one spinbox per latent dimension (5 columns), debounced 15 Hz redraw decoding
the current z, plus a train/val latent-histogram panel.

Headless mode (works without PyQt5):
  python decoder_generator_qt.py <log_dir> --decode-z 0.1,0.5,... -o out.png
  python decoder_generator_qt.py <log_dir> --histogram -o latents.png
"""

import argparse
import sys

import numpy as np

try:
    from PyQt5.QtCore import QTimer
    from PyQt5.QtGui import QImage, QPixmap
    from PyQt5.QtWidgets import (
        QApplication,
        QDoubleSpinBox,
        QGridLayout,
        QHBoxLayout,
        QLabel,
        QMainWindow,
        QVBoxLayout,
        QWidget,
    )

    HAVE_QT = True
except ImportError:  # pragma: no cover
    HAVE_QT = False


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("log_dir", type=str, help="Model log directory")
    parser.add_argument("--decode-z", type=str, default=None,
                        help="Comma-separated z vector -> headless decode to PNG")
    parser.add_argument("--histogram", action="store_true",
                        help="Headless: dump train/val latent histogram")
    parser.add_argument("--output", "-o", type=str, default="decoded.png")
    parser.add_argument("--warmup", action="store_true",
                        help="Decode one zero vector before the window shows "
                             "— the first decode's jit (minutes at flagship "
                             "scale on remote-compile runtimes) happens at "
                             "launch instead of freezing the GUI on the "
                             "first spinbox change")
    return parser.parse_args()


def decode_z_to_png(model, config, z_values, output_path):
    from PIL import Image

    latent = int(config["model"]["latent_dimensions"])
    z = np.zeros((1, latent), np.float32)
    z[0, : min(len(z_values), latent)] = z_values[:latent]
    img = np.asarray(model.decode(z, apply_sigmoid=True))[0]
    u8 = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
    if u8.shape[-1] == 3:
        Image.fromarray(u8, mode="RGB").save(output_path)
    else:
        # PIL's 'L' mode needs a 2-D array, not (H, W, 1)
        Image.fromarray(u8[..., 0], mode="L").save(output_path)
    print(f"decoded z -> {output_path}")


def latent_histograms_to_png(model, config, output_path):
    import matplotlib

    matplotlib.use("agg")
    import matplotlib.pyplot as plt

    from trustedai_cl_vae_ad_tpu.data.loader import load_data

    data = load_data(config)
    import jax.numpy as jnp

    from trustedai_cl_vae_ad_tpu.data.loader import iter_images

    def encode_split(split):
        zs = []
        for img in iter_images(split):
            # no f32 pre-cast: call_detailed handles the uint8 contract itself
            zs.append(np.asarray(model.call_detailed(jnp.asarray(img))[1]))
        return np.concatenate(zs) if zs else np.zeros((0, 1))

    z_train = encode_split(data["train"])
    fig, ax = plt.subplots(1, 1)
    ax.hist(z_train.flatten(), bins=64, alpha=0.65, label="train")
    if data.get("val") is not None:
        z_val = encode_split(data["val"])
        ax.hist(z_val.flatten(), bins=64, alpha=0.65, label="val")
    ax.legend()
    ax.grid()
    ax.set_title("Latent Histograms")
    fig.savefig(output_path)
    print(f"latent histograms -> {output_path}")


if HAVE_QT:

    class DecoderGeneratorMainWindow(QMainWindow):
        REDRAW_MS = 66  # ~15 Hz debounce (reference :96-98)
        SPIN_COLS = 5   # (reference :204-241)

        def __init__(self, model, config):
            super().__init__()
            self.model = model
            self.config = config
            self.latent = int(config["model"]["latent_dimensions"])
            self._dirty = True

            self.image_label = QLabel("decoded")
            self.image_label.setMinimumSize(320, 240)

            grid = QGridLayout()
            self.spinboxes = []
            for i in range(self.latent):
                sb = QDoubleSpinBox()
                sb.setRange(-10.0, 10.0)
                sb.setSingleStep(0.1)
                sb.valueChanged.connect(self._mark_dirty)
                self.spinboxes.append(sb)
                grid.addWidget(QLabel(f"z{i}"), i // self.SPIN_COLS, 2 * (i % self.SPIN_COLS))
                grid.addWidget(sb, i // self.SPIN_COLS, 2 * (i % self.SPIN_COLS) + 1)

            layout = QHBoxLayout()
            layout.addWidget(self.image_label)
            right = QVBoxLayout()
            right.addLayout(grid)
            layout.addLayout(right)
            main = QWidget()
            main.setLayout(layout)
            self.setCentralWidget(main)

            self.timer = QTimer()
            self.timer.timeout.connect(self._redraw)
            self.timer.start(self.REDRAW_MS)

        def _mark_dirty(self, *_):
            self._dirty = True

        def _redraw(self):
            if not self._dirty:
                return
            self._dirty = False
            z = np.array([[sb.value() for sb in self.spinboxes]], np.float32)
            img = np.asarray(self.model.decode(z, apply_sigmoid=True))[0]
            u8 = np.ascontiguousarray(
                np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
            )
            h, w, _ = u8.shape
            qimg = QImage(u8.data, w, h, 3 * w, QImage.Format_RGB888)
            self.image_label.setPixmap(
                QPixmap.fromImage(qimg).scaled(self.image_label.size())
            )


def main():
    args = get_args()

    from trustedai_cl_vae_ad_tpu.registry import load_model_from_directory

    model, config = load_model_from_directory(args.log_dir)

    if args.decode_z is not None:
        z_values = np.array([float(v) for v in args.decode_z.split(",")], np.float32)
        decode_z_to_png(model, config, z_values, args.output)
        return
    if args.histogram:
        latent_histograms_to_png(model, config, args.output)
        return

    if not HAVE_QT:
        print(
            "PyQt5 is not available. Headless modes:\n"
            "  --decode-z 0.1,0.2,...   decode a latent vector to PNG\n"
            "  --histogram              dump latent histograms",
            file=sys.stderr,
        )
        raise SystemExit(2)
    if args.warmup:
        # decode is pure (no rng, no state): one throwaway execution warms
        # both the compile and jax's call caches, unlike the streaming
        # engines' lower().compile() which must not execute
        import jax.numpy as jnp

        print("warming up (compiling the decoder)")
        latent = int(config["model"]["latent_dimensions"])
        np.asarray(model.decode(jnp.zeros((1, latent), jnp.float32),
                                apply_sigmoid=True))
    app = QApplication(sys.argv)
    window = DecoderGeneratorMainWindow(model, config)
    window.show()
    raise SystemExit(app.exec_())


if __name__ == "__main__":
    main()
