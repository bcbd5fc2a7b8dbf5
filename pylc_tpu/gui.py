"""Minimal desktop GUI for interactive classification.

Functional replacement for the reference's dead tkinter skeleton
(gui/classifier_gui.py:23-92, never imported by the CLI): pick a model
and an image, run segmentation, preview the colour mask side-by-side,
save to disk.  Import-guarded so headless environments never pay for
tkinter.

Launch:  python -m pylc_tpu.gui
"""

from __future__ import annotations

import os
import threading


class ClassifierGUI:
    def __init__(self):
        import tkinter as tk
        from tkinter import filedialog, messagebox

        self.tk = tk
        self.filedialog = filedialog
        self.messagebox = messagebox
        self.root = tk.Tk()
        self.root.title("PyLC-TPU Land Cover Classifier")
        self.model_path = tk.StringVar()
        self.img_path = tk.StringVar()
        self.status = tk.StringVar(value="Pick a model and an image.")
        self._result = None
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
        if not (self.model_path.get() and self.img_path.get()):
            self.messagebox.showwarning("PyLC-TPU",
                                        "Select a model and an image first.")
            return
        self.status.set("Segmenting… (first run compiles; be patient)")
        threading.Thread(target=self._segment_worker, daemon=True).start()

    def _segment_worker(self):
        try:
            from pylc_tpu.config import Config
            from pylc_tpu.infer import Segmenter
            from pylc_tpu.tester import load_model

            cfg, state, predict = load_model(self.model_path.get(), Config())
            seg = Segmenter(cfg, state, predict)
            res = seg.segment_file(self.img_path.get())
            self._result = res
            self.root.after(0, lambda: self._show(res))
        except Exception as e:  # surface errors in the UI
            self.root.after(0, lambda: self.status.set(f"Error: {e}"))

    def _show(self, res):
        import numpy as np
        mask = res["mask_rgb"]
        h, w = mask.shape[:2]
        scale = max(1, max(h, w) // 640)
        small = mask[::scale, ::scale]
        ppm = (b"P6 %d %d 255 " % (small.shape[1], small.shape[0])
               + np.ascontiguousarray(small).tobytes())
        photo = self.tk.PhotoImage(data=ppm, format="PPM")
        self.canvas.configure(image=photo)
        self.canvas.image = photo
        mp, s = res["megapixels"], res["seconds"]
        self.status.set(f"Done: {mp:.1f} MP in {s:.2f}s ({mp / s:.1f} MP/s)")

    def save_mask(self):
        if self._result is None:
            self.messagebox.showwarning("PyLC-TPU", "Segment an image first.")
            return
        import cv2
        path = self.filedialog.asksaveasfilename(defaultextension=".png")
        if path:
            cv2.imwrite(path, cv2.cvtColor(self._result["mask_rgb"],
                                           cv2.COLOR_RGB2BGR))
            self.status.set(f"Saved {os.path.basename(path)}")

    def run(self):
        self.root.mainloop()


def main():
    ClassifierGUI().run()


if __name__ == "__main__":
    main()
