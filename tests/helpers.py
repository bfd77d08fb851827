"""Tiny scene builders shared across tests (kept small: 1-core CI host)."""

from path_trace_golang_tpu import scene as S

REF_SCENES = "/root/reference/scenes"


def mat(id, type="lambert", albedo=(0.5, 0.5, 0.5), **kw):
    kwargs = dict(kw)
    for key in ("albedo", "emit", "absorption", "tint"):
        if key in kwargs and isinstance(kwargs[key], tuple):
            kwargs[key] = S.Color(*kwargs[key])
    return S.Material(id=id, type=type, albedo=S.Color(*albedo), **kwargs)


def obj(id, type, pos, size=(0, 0, 0), material_id=""):
    return S.Object(
        id=id, type=type, position=S.Vec3(*pos), size=S.Vec3(*size), material_id=material_id
    )


def base_camera():
    return S.Camera(
        position=S.Vec3(0, 1, 5), target=S.Vec3(0, 1, 0), up=S.Vec3(0, 1, 0), fov=60
    )


def solid_sky(rgb=(0.6, 0.7, 0.9)):
    return S.Sky(type="solid", color=S.Color(*rgb))


def empty_scene(sky=None):
    return S.Scene(name="empty", camera=base_camera(), sky=sky or solid_sky())


def lambert_floor_scene(albedo=(0.5, 0.5, 0.5), sky_rgb=(1.0, 1.0, 1.0)):
    """Camera looking straight down at an infinite lambert plane."""
    sc = S.Scene(
        name="floor",
        camera=S.Camera(
            position=S.Vec3(0, 3, 0), target=S.Vec3(0, 0, 0), up=S.Vec3(0, 0, -1), fov=40
        ),
        sky=solid_sky(sky_rgb),
        materials=[mat("floor", "lambert", albedo)],
        objects=[obj("p", "plane", (0, 0, 0), material_id="floor")],
    )
    return sc


def full_feature_scene():
    """One light, every material type, fog — exercises the whole gpu contract."""
    return S.Scene(
        name="full",
        camera=S.Camera(
            position=S.Vec3(0, 1.5, 6),
            target=S.Vec3(0, 1, 0),
            up=S.Vec3(0, 1, 0),
            fov=55,
            aperture=0.05,
            focus_dist=6,
        ),
        sky=S.Sky(type="gradient", horizon=S.Color(0.2, 0.2, 0.25), zenith=S.Color(0.02, 0.02, 0.05)),
        materials=[
            mat("grey", "lambert", (0.6, 0.6, 0.6)),
            mat("red", "lambert", (0.7, 0.1, 0.1)),
            mat("chrome", "metal", (0.9, 0.9, 0.9), smoothness=0.6, reflectivity=0.9),
            mat("mirror", "mirror", (0.95, 0.95, 0.95)),
            mat("glass", "dielectric", (1, 1, 1), ior=1.5, absorption=(0.3, 0.1, 0.05)),
            mat("lamp", "emissive", emit=(1, 0.9, 0.8), power=8.0),
        ],
        objects=[
            obj("floor", "plane", (0, 0, 0), material_id="grey"),
            obj("ball", "sphere", (-1.6, 1, 0), (1, 0, 0), material_id="red"),
            obj("metal", "sphere", (1.6, 1, 0), (1, 0, 0), material_id="chrome"),
            obj("mir", "box", (0, 1.5, -3), (4, 3, 0.2), material_id="mirror"),
            obj("cube", "box", (0, 0.75, 1.5), (1.2, 1.5, 1.2), material_id="glass"),
            obj("light", "sphere_light", (0, 4, 2), (0.6, 0, 0), material_id="lamp"),
        ],
        fog=S.Fog(
            sigma_s=0.02,
            sigma_a=0.01,
            g=0.3,
            color=S.Color(1, 1, 1),
            scatter=1.0,
            affect_sky=True,
            density=0.01,
            gpu_volumetric=True,
            hetero_strength=0.5,
            noise_scale=2.0,
            noise_octaves=3,
        ),
    )
