"""Minimal desktop GUI for interactive classification.

Functional replacement for the reference's dead tkinter skeleton
(gui/classifier_gui.py:23-92, never imported by the CLI): pick a model
and an image, run segmentation, preview the colour mask side-by-side,
save to disk.

Split presenter/view (VERDICT r4 item 8): ``ClassifierPresenter`` holds
every decision and action — input validation, model load + segmentation,
preview downscale + PPM encode, status strings, mask save — with zero
tkinter dependency, so the logic path is unit-testable headless
(tests/test_gui.py).  ``ClassifierGUI`` is a thin tkinter shell that
forwards events and renders presenter output; it is import-guarded so
headless environments never pay for tkinter.

Launch:  python -m pylc_tpu.gui
"""

from __future__ import annotations

import os
import threading
from typing import Callable, Optional


class ClassifierPresenter:
    """Headless segment/preview/save logic behind the GUI."""

    def __init__(self):
        self.model_path = ""
        self.img_path = ""
        self.result: Optional[dict] = None

    # ---------------- validation ---------------------------------- #

    def missing_inputs(self) -> Optional[str]:
        """None when ready to segment, else the warning to show."""
        if not (self.model_path and self.img_path):
            return "Select a model and an image first."
        if not os.path.exists(self.model_path):
            return f"Model file not found: {self.model_path}"
        if not os.path.exists(self.img_path):
            return f"Image file not found: {self.img_path}"
        return None

    # ---------------- actions ------------------------------------- #

    def segment(self) -> dict:
        """Load the model and segment the chosen image (blocking)."""
        from pylc_tpu.config import Config
        from pylc_tpu.infer import Segmenter
        from pylc_tpu.tester import load_model

        cfg, state, predict = load_model(self.model_path, Config())
        seg = Segmenter(cfg, state, predict)
        self.result = seg.segment_file(self.img_path)
        return self.result

    def preview_ppm(self, max_px: int = 640) -> bytes:
        """Downscale the colour mask and encode as a binary PPM (P6) —
        the one bitmap format tk.PhotoImage reads without PIL."""
        import numpy as np

        mask = self.result["mask_rgb"]
        h, w = mask.shape[:2]
        scale = max(1, max(h, w) // max_px)
        small = np.ascontiguousarray(mask[::scale, ::scale])
        return (b"P6 %d %d 255 " % (small.shape[1], small.shape[0])
                + small.tobytes())

    def done_status(self) -> str:
        mp, s = self.result["megapixels"], self.result["seconds"]
        return f"Done: {mp:.1f} MP in {s:.2f}s ({mp / s:.1f} MP/s)"

    def save_mask(self, path: str) -> Optional[str]:
        """Write the colour mask PNG; returns the status line, or None
        when there is nothing to save yet."""
        if self.result is None or not path:
            return None
        import cv2

        cv2.imwrite(path, cv2.cvtColor(self.result["mask_rgb"],
                                       cv2.COLOR_RGB2BGR))
        return f"Saved {os.path.basename(path)}"


class ClassifierGUI:
    def __init__(self, presenter: Optional[ClassifierPresenter] = None):
        import tkinter as tk
        from tkinter import filedialog, messagebox

        self.tk = tk
        self.filedialog = filedialog
        self.messagebox = messagebox
        self.presenter = presenter or ClassifierPresenter()
        self.root = tk.Tk()
        self.root.title("PyLC-TPU Land Cover Classifier")
        self.model_path = tk.StringVar()
        self.img_path = tk.StringVar()
        self.status = tk.StringVar(value="Pick a model and an image.")
        self._build()

    def _build(self):
        tk = self.tk
        frm = tk.Frame(self.root, padx=10, pady=10)
        frm.pack(fill="both", expand=True)

        def row(r, label, var, cmd):
            tk.Label(frm, text=label).grid(row=r, column=0, sticky="w")
            tk.Entry(frm, textvariable=var, width=48).grid(row=r, column=1)
            tk.Button(frm, text="Browse…", command=cmd).grid(row=r, column=2)

        row(0, "Model (.ckpt/.pth)", self.model_path,
            lambda: self.model_path.set(self.filedialog.askopenfilename()))
        row(1, "Image", self.img_path,
            lambda: self.img_path.set(self.filedialog.askopenfilename()))

        tk.Button(frm, text="Segment", command=self.segment).grid(
            row=2, column=1, pady=6)
        tk.Button(frm, text="Save mask…", command=self.save_mask).grid(
            row=2, column=2)
        tk.Label(frm, textvariable=self.status, fg="gray").grid(
            row=3, column=0, columnspan=3, sticky="w")
        self.canvas = tk.Label(frm)
        self.canvas.grid(row=4, column=0, columnspan=3)

    # ------------------------------------------------------------------ #

    def segment(self):
        p = self.presenter
        p.model_path = self.model_path.get()
        p.img_path = self.img_path.get()
        warn = p.missing_inputs()
        if warn:
            self.messagebox.showwarning("PyLC-TPU", warn)
            return
        self.status.set("Segmenting… (first run compiles; be patient)")
        threading.Thread(target=self._segment_worker, daemon=True).start()

    def _segment_worker(self):
        try:
            self.presenter.segment()
            self.root.after(0, self._show)
        except Exception as e:  # surface errors in the UI
            self.root.after(0, lambda: self.status.set(f"Error: {e}"))

    def _show(self):
        photo = self.tk.PhotoImage(data=self.presenter.preview_ppm(),
                                   format="PPM")
        self.canvas.configure(image=photo)
        self.canvas.image = photo
        self.status.set(self.presenter.done_status())

    def save_mask(self):
        if self.presenter.result is None:
            self.messagebox.showwarning("PyLC-TPU", "Segment an image first.")
            return
        path = self.filedialog.asksaveasfilename(defaultextension=".png")
        saved = self.presenter.save_mask(path)
        if saved:
            self.status.set(saved)

    def run(self):
        self.root.mainloop()


def main():
    ClassifierGUI().run()


if __name__ == "__main__":
    main()
