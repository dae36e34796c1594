"""Visualization: sphere plots, animations, matrix spy.

API parity with reference quflow/graphics.py (``resample`` :90-121,
``plot`` :124-343, ``Animation``/``create_animation`` :349-688, ``spy``
:691-720).  matplotlib is required; cartopy (orthographic/perspective
projections) and ffmpeg are optional and gated.  Animations use
matplotlib.animation writers (ffmpeg when present, else Pillow) instead of a
hand-rolled ffmpeg pipe.
"""

from __future__ import annotations

import numpy as np

try:
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    _has_matplotlib = True
except ImportError:  # pragma: no cover
    _has_matplotlib = False

try:  # pragma: no cover - cartopy not in this environment
    import cartopy.crs as ccrs

    _has_cartopy = True
except ImportError:
    _has_cartopy = False

from scipy.ndimage import map_coordinates

from .quantization import mat2shr
from .transforms import as_fun

__all__ = [
    "resample",
    "plot",
    "plot2",
    "spy",
    "Animation",
    "create_animation",
    "adjust_colormap_brightness",
]


def adjust_colormap_brightness(cmap_name, r, N=None):
    """Return a ListedColormap with brightness scaled by r (>1 brighter,
    <1 darker); parity with reference graphics.py:31-87."""
    if not _has_matplotlib:  # pragma: no cover
        raise ImportError("matplotlib is required")
    from matplotlib.colors import ListedColormap
    import matplotlib.cm as cm

    cmap = cm.get_cmap(cmap_name, N) if N else cm.get_cmap(cmap_name)
    colors = cmap(np.linspace(0, 1, cmap.N))
    if r >= 1.0:
        colors[:, :3] = 1.0 - (1.0 - colors[:, :3]) / r
    else:
        colors[:, :3] = colors[:, :3] * r
    return ListedColormap(np.clip(colors, 0, 1))


def resample(data, N):
    """Up-/downsample any representation to resolution N: coefficient
    truncation/zero-padding for mat/shr data, bilinear interpolation for
    grid functions."""
    data = np.asarray(data)
    if data.ndim == 2:
        if np.iscomplexobj(data) and data.shape[0] == data.shape[1]:
            omega = mat2shr(data)
        elif np.isrealobj(data) and 2 * data.shape[0] - 1 == data.shape[1]:
            if data.shape[0] == N:
                return data
            X, Y = np.meshgrid(
                np.linspace(0, data.shape[0] - 1, N, endpoint=True),
                np.linspace(0, data.shape[1], 2 * N - 1, endpoint=False),
                indexing="ij",
            )
            return map_coordinates(data, np.array([X, Y]), order=1, mode="reflect")
        else:
            raise NotImplementedError("Resampling this data is not supported yet.")
    elif data.ndim == 1:
        omega = data
    else:
        raise NotImplementedError("Resampling this data is not supported yet.")
    omega2 = np.zeros(N**2, dtype=omega.dtype)
    n = min(N**2, omega.shape[0])
    omega2[:n] = omega[:n]
    return omega2


def plot(
    data,
    fig=None,
    ax=None,
    dpi=None,
    colorbar=False,
    title=None,
    padding=None,
    N=None,
    time=None,
    projection="hammer",
    central_latitude=20,
    central_longitude=30,
    annotate=None,
    grid=True,
    grid_kwargs=None,
    contours=None,
    contour_data=None,
    contour_kwargs=None,
    **kwargs,
):
    """Plot a state (mat | shr | shc | fun) on the sphere.

    ``projection``: 'hammer' or 'mollweide' (matplotlib), 'orthographic' or
    'perspective' (cartopy, if installed), or None for raw theta-phi axes.
    Returns the QuadMesh from pcolormesh.
    """
    if not _has_matplotlib:  # pragma: no cover
        raise ImportError("matplotlib is required for plotting")

    use_cartopy = False
    if N is not None:
        data = resample(np.asarray(data), N)
    fun = as_fun(np.asarray(data))
    if np.iscomplexobj(fun):
        fun = fun.real

    if projection in ("orthographic", "perspective"):
        if not _has_cartopy:
            raise ImportError(
                f"projection='{projection}' requires cartopy (not installed)"
            )
        if projection == "orthographic":  # pragma: no cover
            projection = ccrs.Orthographic(
                central_latitude=central_latitude,
                central_longitude=central_longitude,
            )
        else:  # pragma: no cover
            projection = ccrs.NearsidePerspective(
                central_latitude=central_latitude,
                central_longitude=central_longitude,
            )
    if _has_cartopy and isinstance(projection, ccrs.CRS):  # pragma: no cover
        use_cartopy = True

    if ax is None:
        if fig is None:
            figsize = plt.rcParams.get("figure.figsize")
            fig = plt.figure(
                figsize=(figsize[0], figsize[0] * fun.shape[0] / fun.shape[1]),
                dpi=dpi,
            )
        if use_cartopy:  # pragma: no cover
            ax = fig.add_subplot(projection=projection)
        elif projection in ("hammer", "mollweide"):
            ax = fig.add_subplot(projection=projection)
        else:
            ax = fig.add_subplot()
        if title:
            ax.set_title(title)

    minmax = np.abs(fun).max()
    kwargs.setdefault("vmin", -minmax)
    kwargs.setdefault("vmax", minmax)
    kwargs.setdefault("cmap", "RdBu_r")

    lon = np.linspace(-np.pi, np.pi, fun.shape[1], endpoint=False)
    lat = np.linspace(-np.pi / 2.0, np.pi / 2.0, fun.shape[0])
    # plot north pole up: theta ascends from the pole, latitude descends
    fun_plot = fun[::-1, :]

    grid_kwargs = {**{"color": "black", "alpha": 0.2}, **(grid_kwargs or {})}
    if use_cartopy:  # pragma: no cover
        lon = lon * 180 / np.pi
        lat = lat * 180 / np.pi
        kwargs.setdefault("transform", ccrs.PlateCarree())
    im = ax.pcolormesh(lon, lat, fun_plot, rasterized=True, **kwargs)

    if grid:
        if use_cartopy:  # pragma: no cover
            ax.gridlines(draw_labels=False, dms=True, **grid_kwargs)
        else:
            ax.grid(linestyle="-", **grid_kwargs)
    ax.set_xticklabels([])
    ax.set_yticklabels([])

    if time is not None:
        ax.text(
            0.05, 0.95, f"time: {time:.2f}", transform=ax.transAxes,
            verticalalignment="top",
        )
    if colorbar:
        im.figure.colorbar(mappable=im, ax=ax)
    if annotate is not None:
        ax.set_autoscale_on(False)
        xlim, ylim = ax.get_xlim(), ax.get_ylim()
        annotate(ax)
        ax.set_xlim(xlim)
        ax.set_ylim(ylim)

    if isinstance(contours, bool) and not contours:
        contours = None
    if contours is not None:
        if contour_data is None:
            contour_fun = fun_plot
        else:
            if N is not None:
                contour_data = resample(np.asarray(contour_data), N)
            contour_fun = as_fun(np.asarray(contour_data))
            if np.iscomplexobj(contour_fun):
                contour_fun = contour_fun.real
            contour_fun = contour_fun[::-1, :]
        ckw = {
            "negative_linestyles": "solid",
            "colors": None if contour_kwargs and "cmap" in contour_kwargs else "k",
            "linewidths": 0.5,
            "vmin": kwargs["vmin"],
            "vmax": kwargs["vmax"],
            "levels": 10 if isinstance(contours, bool) else contours,
        }
        if use_cartopy:  # pragma: no cover
            ckw["transform"] = kwargs["transform"]
        ckw.update(contour_kwargs or {})
        ax.contour(lon, lat, contour_fun, **ckw)
    return im


plot2 = plot


def spy(W, colorbar=True, logscale=True, ax=None):
    """Visualize a complex matrix: |W| with optional log scale."""
    if not _has_matplotlib:  # pragma: no cover
        raise ImportError("matplotlib is required for plotting")
    W = np.asarray(W)
    mag = np.abs(W)
    if logscale:
        mag = np.log10(mag + 1e-300)
    if ax is None:
        _, ax = plt.subplots()
    im = ax.imshow(mag, cmap="viridis")
    if colorbar:
        im.figure.colorbar(im, ax=ax)
    return im


class Animation:
    """Streaming animation writer (context manager).

    with Animation("out.mp4", fps=25) as anim:
        for W in states:
            anim.add_frame(W)
    """

    def __init__(self, filename, fps=25, dpi=100, preset="medium",
                 extra_args=None, codec=None, plot_kwargs=None):
        if not _has_matplotlib:  # pragma: no cover
            raise ImportError("matplotlib is required for animations")
        self.filename = str(filename)
        self.fps = fps
        self.dpi = dpi
        self.plot_kwargs = plot_kwargs or {}
        self._writer = None
        self._fig = None
        self._im = None

    def __enter__(self):
        return self

    def _init_writer(self, fun):
        from matplotlib import animation as manim

        self._fig = plt.figure(
            figsize=(fun.shape[1] / self.dpi, fun.shape[0] / self.dpi),
            dpi=self.dpi,
        )
        ax = self._fig.add_axes([0, 0, 1, 1])
        ax.set_axis_off()
        vmax = np.abs(fun).max()
        self._im = ax.imshow(
            fun[::-1, :], cmap=self.plot_kwargs.get("cmap", "RdBu_r"),
            vmin=self.plot_kwargs.get("vmin", -vmax),
            vmax=self.plot_kwargs.get("vmax", vmax),
        )
        if manim.FFMpegWriter.isAvailable() and self.filename.endswith(".mp4"):
            self._writer = manim.FFMpegWriter(fps=self.fps)
        else:
            if self.filename.endswith(".mp4"):
                self.filename = self.filename[:-4] + ".gif"
            self._writer = manim.PillowWriter(fps=self.fps)
        self._writer.setup(self._fig, self.filename, dpi=self.dpi)

    def add_frame(self, data):
        fun = as_fun(np.asarray(data))
        if np.iscomplexobj(fun):
            fun = fun.real
        if self._writer is None:
            self._init_writer(fun)
        self._im.set_data(fun[::-1, :])
        self._writer.grab_frame()

    def close(self):
        if self._writer is not None:
            self._writer.finish()
            plt.close(self._fig)
            self._writer = None

    def __exit__(self, exc_type, exc_value, traceback):
        self.close()
        return False


plot2 = plot  # reference alias (quflow/graphics.py:346)


def create_animation(
    filename, states, N=None, fps=25, preset="medium", extra_args=None,
    codec=None, progress_bar=True, progress_file=None, **kwargs
):
    """Render a sequence of states to a video/gif file."""
    pbar = None
    if progress_bar:
        try:
            from tqdm.auto import tqdm

            total = len(states)
            if progress_file is not None and isinstance(progress_file, str):
                progress_file = open(progress_file, "w")
            pbar = tqdm(
                total=total, unit=" frames", file=progress_file,
                ascii=progress_file is not None, mininterval=1.0,
            )
        except ModuleNotFoundError:
            pbar = None
    with Animation(filename, fps=fps, plot_kwargs=kwargs) as anim:
        for state in states:
            if N is not None:
                state = resample(np.asarray(state), N)
            anim.add_frame(state)
            if pbar is not None:
                pbar.update(1)
    if pbar is not None:
        pbar.close()
    return anim.filename


create_animation2 = create_animation
