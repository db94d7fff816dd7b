"""Minimal PyQt5 stand-in so the Qt shells' logic runs under pytest.

PyQt5 isn't installed in CI; this emulates just enough of its surface
(widgets as state-recording objects, signals as callback lists, manual-fire
timers) for camera_streamer_qt.py / decoder_generator_qt.py to import and
execute their real event-handler code. Install with ``install()`` BEFORE
importing the shell module.
"""

from __future__ import annotations

import sys
import types


class Signal:
    def __init__(self):
        self._slots = []

    def connect(self, fn):
        self._slots.append(fn)

    def emit(self, *a):
        for fn in list(self._slots):
            fn(*a)


class QSize:
    def __init__(self, w=320, h=240):
        self._w, self._h = w, h

    def width(self):
        return self._w

    def height(self):
        return self._h


class _WidgetBase:
    def __init__(self, *a, **k):
        self.toggled = Signal()
        self.clicked = Signal()
        self.valueChanged = Signal()
        self._text = ""
        self._value = 0.0
        self._checked = False
        self._items = []
        self._current = 0
        self._stylesheet = ""
        self._pixmaps = []

    # geometry / layout
    def setMinimumSize(self, *a):
        pass

    def setAlignment(self, *a):
        pass

    def resize(self, *a):
        pass

    def show(self):
        pass

    def size(self):
        return QSize()

    def setLayout(self, *a):
        pass

    def setCentralWidget(self, *a):
        pass

    def setAutoFillBackground(self, *a):
        pass

    # text / style
    def setText(self, t):
        self._text = str(t)

    def text(self):
        return self._text

    def setStyleSheet(self, s):
        self._stylesheet = s

    def styleSheet(self):
        return self._stylesheet

    # pixmaps
    def setPixmap(self, p):
        self._pixmaps.append(p)

    # check / value
    def setCheckable(self, *a):
        pass

    def setChecked(self, v):
        changed = self._checked != bool(v)
        self._checked = bool(v)
        if changed:
            self.toggled.emit(self._checked)

    def isChecked(self):
        return self._checked

    def setValue(self, v):
        self._value = v
        self.valueChanged.emit(v)

    def value(self):
        return self._value

    def setRange(self, *a):
        pass

    def setSuffix(self, *a):
        pass

    def setSingleStep(self, *a):
        pass

    def setDecimals(self, *a):
        pass

    # combo
    def addItems(self, items):
        self._items.extend(items)

    def setCurrentIndex(self, i):
        self._current = i

    def setCurrentText(self, t):
        self._current = self._items.index(t)

    def currentText(self):
        return self._items[self._current] if self._items else ""

    def setWindowTitle(self, *a):
        pass


class QTimer(_WidgetBase):
    instances = []

    def __init__(self):
        super().__init__()
        self.timeout = Signal()
        self.interval = None
        self.active = False
        QTimer.instances.append(self)

    def start(self, ms=0):
        self.interval = ms
        self.active = True

    def stop(self):
        self.active = False

    def fire(self):
        self.timeout.emit()


class _Layout:
    def __init__(self, *a, **k):
        self.widgets = []

    def addWidget(self, w, *a):
        self.widgets.append(w)

    def addLayout(self, l, *a):
        self.widgets.append(l)


class QPixmap(_WidgetBase):
    def __init__(self, img=None):
        super().__init__()
        self.img = img

    @staticmethod
    def fromImage(img):
        return QPixmap(img)

    def copy(self):
        return self

    def scaled(self, *a, **k):
        return self


class QImage:
    """Performs real Qt scanline math: validates the buffer against the
    declared stride and decodes pixels row-by-row AT that stride — so a
    wrong bytes-per-line (the classic integration bug on widths whose
    3*w is not a multiple of 4, invisible to a no-op stub) either trips
    the buffer-size assertion or produces a skewed ``array`` that
    pixel-equality tests catch."""

    Format_RGB888 = 13
    _BPP = {Format_RGB888: 3}

    def __init__(self, data, w, h, stride, fmt):
        import numpy as np

        self.w, self.h = w, h
        self.fmt = fmt
        bpp = self._BPP[fmt]
        buf = data if isinstance(data, memoryview) else memoryview(data)
        buf = buf.cast("B") if buf.ndim != 1 or buf.format != "B" else buf
        assert stride >= bpp * w, f"stride {stride} < {bpp}*{w} bytes/row"
        # Qt reads rows at `stride` offsets; the last row only needs its pixels
        need = stride * (h - 1) + bpp * w
        assert len(buf) >= need, (
            f"QImage buffer too small for stride math: {len(buf)} < {need} "
            f"(w={w} h={h} stride={stride})")
        rows = [np.frombuffer(buf, np.uint8, count=bpp * w, offset=r * stride)
                for r in range(h)]
        self.array = np.stack(rows).reshape(h, w, bpp).copy()


class QFileDialog:
    # tests stuff these queues to script the dialogs
    existing_dirs = []
    open_files = []

    @staticmethod
    def getExistingDirectory(*a, **k):
        return QFileDialog.existing_dirs.pop(0) if QFileDialog.existing_dirs else ""

    @staticmethod
    def getOpenFileName(*a, **k):
        f = QFileDialog.open_files.pop(0) if QFileDialog.open_files else ""
        return f, ""


class QMessageBox:
    messages = []

    @staticmethod
    def critical(parent, title, text):
        QMessageBox.messages.append(("critical", title, text))

    @staticmethod
    def information(parent, title, text):
        QMessageBox.messages.append(("information", title, text))


class QApplication:
    _instance = None

    def __init__(self, argv):
        QApplication._instance = self
        self.exit_code = None

    def exec_(self):
        return self.exit_code if self.exit_code is not None else 0

    def exit(self, code=0):
        # real Qt: quits the event loop with this return code
        self.exit_code = code

    @staticmethod
    def instance():
        return QApplication._instance


class QAction(_WidgetBase):
    def __init__(self, text="", *a, **k):
        super().__init__()
        self._text = text
        self.triggered = Signal()

    def text(self):
        return self._text

    def trigger(self):
        # real Qt passes the checked state to triggered slots
        self.triggered.emit(self.isChecked())


class QMenu(_WidgetBase):
    def __init__(self, title="", *a, **k):
        super().__init__()
        self.title = title
        self.actions_ = []

    def addAction(self, text):
        a = QAction(text)
        self.actions_.append(a)
        return a

    def clear(self):
        self.actions_ = []


class QMenuBar(_WidgetBase):
    def __init__(self, *a, **k):
        super().__init__()
        self.menus = []

    def addMenu(self, title):
        m = QMenu(title)
        self.menus.append(m)
        return m


class QActionGroup(_WidgetBase):
    class ExclusionPolicy:
        Exclusive = 1

    def __init__(self, parent=None):
        super().__init__()
        self.actions_ = []

    def addAction(self, a):
        self.actions_.append(a)
        return a

    def setExclusionPolicy(self, *a):
        pass


def install() -> None:
    """Register the stub modules as PyQt5 in sys.modules."""
    qtcore = types.ModuleType("PyQt5.QtCore")
    qtcore.QTimer = QTimer
    qtcore.Qt = types.SimpleNamespace(AlignCenter=0, KeepAspectRatio=0)
    qtgui = types.ModuleType("PyQt5.QtGui")
    qtgui.QImage = QImage
    qtgui.QPixmap = QPixmap
    qtwidgets = types.ModuleType("PyQt5.QtWidgets")
    for name in ("QCheckBox", "QDoubleSpinBox", "QLabel",
                 "QPushButton", "QSpinBox", "QWidget", "QComboBox"):
        setattr(qtwidgets, name, type(name, (_WidgetBase,), {}))
    qtwidgets.QMainWindow = type("QMainWindow", (_WidgetBase,), {
        "menuBar": lambda self: self.__dict__.setdefault("_menubar", QMenuBar()),
    })
    qtwidgets.QAction = QAction
    qtwidgets.QActionGroup = QActionGroup
    qtwidgets.QMenu = QMenu
    qtwidgets.QMenuBar = QMenuBar
    qtwidgets.QHBoxLayout = _Layout
    qtwidgets.QVBoxLayout = _Layout
    qtwidgets.QGridLayout = _Layout
    qtwidgets.QFileDialog = QFileDialog
    qtwidgets.QMessageBox = QMessageBox
    qtwidgets.QApplication = QApplication
    qtwidgets.QScrollArea = type("QScrollArea", (_WidgetBase,), {
        "setWidget": lambda self, w: None,
        "setWidgetResizable": lambda self, v: None,
    })
    pyqt5 = types.ModuleType("PyQt5")
    pyqt5.QtCore = qtcore
    pyqt5.QtGui = qtgui
    pyqt5.QtWidgets = qtwidgets
    sys.modules["PyQt5"] = pyqt5
    sys.modules["PyQt5.QtCore"] = qtcore
    sys.modules["PyQt5.QtGui"] = qtgui
    sys.modules["PyQt5.QtWidgets"] = qtwidgets
