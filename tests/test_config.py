import textwrap

from cudapathtracer_tpu.utils.config import parse_config, match_integrator

REFERENCE_CONFIG = textwrap.dedent("""
    Name: render

    width: 800
    height: 800

    Integrator: VCM
    Sample Count: 500000
    Post Process: true

    Unidirectional Max Depth: 40
    BVH recommended leaf size: 2

    SAMPLE_ENVIRONMENT: false
    BDPT Specifc Settings:
    Bidirectional Eye Depth: 16
    Bidirectional Light Depth: 10

    BDPT_LIGHTTRACE: true
    BDPT_NEE: true
    BDPT_NAIVE: true
    BDPT_CONNECTION: true

    BDPT_DRAWPATH: false
    BDPT_DOMIS: true
    BDPT_PAINTWEIGHT: false

    VCM Merge Radius Power Factor: 0.7
    VCM Initial Merge Radius Multipler: 0.01

    Pinhole Camera: true
    Camera Position: -0.0 -0.0 1.0
    Camera Rotation: -0.0 -0.0 0.0
    Camera Apeture: 0.0
    Camera FocalDist: 0.0
    Camera FOV: 60.0

    Meshes (path; multiplier * emission; materialID):
    scenedata/smallbox.obj; 1.0 * (0.0, 0.0, 0.0); 2
    scenedata/smallwaterlight5.obj; 25.0 * (8.0, 8.0, 8.0); 2
""")


def test_parse_reference_config():
    cfg = parse_config(REFERENCE_CONFIG)
    assert cfg.width == 800 and cfg.height == 800
    assert cfg.integrator == "VCM"
    assert cfg.sample_count == 500000
    assert cfg.max_depth == 40
    assert cfg.bvh_leaf_size == 2
    assert cfg.bdpt_eye_depth == 16 and cfg.bdpt_light_depth == 10
    assert cfg.bdpt_do_mis and not cfg.bdpt_paint_weight
    assert cfg.vcm_merge_const == 0.7
    # the reference parser drops "Multipler" (typo); we accept it
    assert cfg.vcm_initial_merge_radius_multiplier == 0.01
    assert cfg.pinhole_camera
    assert cfg.cam_pos == (-0.0, -0.0, 1.0)
    assert cfg.cam_fov == 60.0
    assert len(cfg.meshes) == 2
    m = cfg.meshes[1]
    assert m.emission_multiplier == 25.0
    assert m.emission == (200.0, 200.0, 200.0)
    assert m.material_id == 2


def test_sppm_normalization():
    cfg = parse_config(REFERENCE_CONFIG.replace("Integrator: VCM",
                                                "Integrator: SPPM"))
    n = cfg.normalized()
    assert n.do_sppm and n.vcm_do_merge
    assert not (n.bdpt_nee or n.bdpt_naive or n.bdpt_connection
                or n.bdpt_light_trace or n.bdpt_do_mis)


def test_integrator_aliases():
    assert match_integrator("BDPT") == "BIDIRECTIONAL"
    assert match_integrator("naive") == "NAIVE_UNIDIRECTIONAL"
    assert match_integrator("pt") == "UNIDIRECTIONAL"
