"""Import harness for the upstream reference at /root/reference.

The reference's observation/reward kernels are plain @torch.jit.script
functions, but they live in modules that import `isaacgym` (closed-source
simulator bindings, not installed here) and other heavyweight deps
(open3d, easydict). This shim makes the *math* runnable:

1. installs a minimal fake `isaacgym` package whose `torch_utils`
   implements the handful of public NVIDIA helper functions the kernels
   call (quat_mul/quat_conjugate/quat_from_angle_axis/..., all xyzw).
   These stubs are themselves validated against scipy.spatial.transform
   in tests/test_reference_parity.py, so they are grounded ground truth,
   not a second hand transcription;
2. imports `phc.utils.torch_utils` (the reference's rotation helper
   module — pure torch once isaacgym resolves);
3. AST-extracts the named top-level kernel functions out of the env
   modules (phc/env/tasks/humanoid*.py) and execs them with the
   @torch.jit.script decorator stripped, so none of the env/simulator
   machinery is imported.

Used only by tests; nothing in pulse_tpu imports this.
"""

from __future__ import annotations

import ast
import sys
import types

import torch

REFERENCE_ROOT = "/root/reference"


# --------------------------------------------------------------------------- #
# minimal isaacgym.torch_utils (public API surface the reference kernels use;
# quaternions are xyzw, matching Isaac Gym / scipy)
# --------------------------------------------------------------------------- #

def normalize(x, eps: float = 1e-9):
    return x / x.norm(p=2, dim=-1).clamp(min=eps, max=None).unsqueeze(-1)


def quat_unit(a):
    return normalize(a)


def quat_mul(a, b):
    assert a.shape == b.shape
    shape = a.shape
    a = a.reshape(-1, 4)
    b = b.reshape(-1, 4)
    x1, y1, z1, w1 = a[:, 0], a[:, 1], a[:, 2], a[:, 3]
    x2, y2, z2, w2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2
    z = w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2
    return torch.stack([x, y, z, w], dim=-1).view(shape)


def quat_conjugate(a):
    shape = a.shape
    a = a.reshape(-1, 4)
    return torch.cat((-a[:, :3], a[:, -1:]), dim=-1).view(shape)


def quat_apply(a, b):
    shape = b.shape
    a = a.reshape(-1, 4)
    b = b.reshape(-1, 3)
    xyz = a[:, :3]
    t = xyz.cross(b, dim=-1) * 2
    return (b + a[:, 3:] * t + xyz.cross(t, dim=-1)).view(shape)


def quat_rotate(q, v):
    q_w = q[:, -1]
    q_vec = q[:, :3]
    a = v * (2.0 * q_w**2 - 1.0).unsqueeze(-1)
    b = torch.cross(q_vec, v, dim=-1) * q_w.unsqueeze(-1) * 2.0
    c = q_vec * torch.bmm(q_vec.view(q.shape[0], 1, 3), v.view(q.shape[0], 3, 1)).squeeze(-1) * 2.0
    return a + b + c


def quat_rotate_inverse(q, v):
    return quat_rotate(quat_conjugate(q), v)


def quat_from_angle_axis(angle, axis):
    theta = (angle / 2).unsqueeze(-1)
    xyz = normalize(axis) * theta.sin()
    w = theta.cos()
    return quat_unit(torch.cat([xyz, w], dim=-1))


def quat_from_euler_xyz(roll, pitch, yaw):
    cy = torch.cos(yaw * 0.5)
    sy = torch.sin(yaw * 0.5)
    cr = torch.cos(roll * 0.5)
    sr = torch.sin(roll * 0.5)
    cp = torch.cos(pitch * 0.5)
    sp = torch.sin(pitch * 0.5)
    qw = cy * cr * cp + sy * sr * sp
    qx = cy * sr * cp - sy * cr * sp
    qy = cy * cr * sp + sy * sr * cp
    qz = sy * cr * cp - cy * sr * sp
    return torch.stack([qx, qy, qz, qw], dim=-1)


def normalize_angle(x):
    return torch.atan2(torch.sin(x), torch.cos(x))


def copysign(a, b):
    a = torch.tensor(a, device=b.device, dtype=torch.float).repeat(b.shape[0])
    return torch.abs(a) * torch.sign(b)


def get_euler_xyz(q):
    qx, qy, qz, qw = 0, 1, 2, 3
    sinr_cosp = 2.0 * (q[:, qw] * q[:, qx] + q[:, qy] * q[:, qz])
    cosr_cosp = q[:, qw] * q[:, qw] - q[:, qx] * q[:, qx] - q[:, qy] * q[:, qy] + q[:, qz] * q[:, qz]
    roll = torch.atan2(sinr_cosp, cosr_cosp)
    sinp = 2.0 * (q[:, qw] * q[:, qy] - q[:, qz] * q[:, qx])
    pitch = torch.where(torch.abs(sinp) >= 1, copysign(torch.pi / 2.0, sinp), torch.asin(sinp))
    siny_cosp = 2.0 * (q[:, qw] * q[:, qz] + q[:, qx] * q[:, qy])
    cosy_cosp = q[:, qw] * q[:, qw] + q[:, qx] * q[:, qx] - q[:, qy] * q[:, qy] - q[:, qz] * q[:, qz]
    yaw = torch.atan2(siny_cosp, cosy_cosp)
    return roll % (2 * torch.pi), pitch % (2 * torch.pi), yaw % (2 * torch.pi)


def to_torch(x, dtype=torch.float, device="cpu", requires_grad=False):
    return torch.tensor(x, dtype=dtype, device=device, requires_grad=requires_grad)


def _install_fake_isaacgym():
    if "isaacgym" in sys.modules:
        return
    pkg = types.ModuleType("isaacgym")
    tu = types.ModuleType("isaacgym.torch_utils")
    exported = [
        "normalize", "quat_unit", "quat_mul", "quat_conjugate", "quat_apply",
        "quat_rotate", "quat_rotate_inverse", "quat_from_angle_axis",
        "quat_from_euler_xyz", "normalize_angle", "copysign", "get_euler_xyz",
        "to_torch",
    ]
    g = globals()
    for name in exported:
        setattr(tu, name, g[name])
    tu.__all__ = exported
    gymapi = types.ModuleType("isaacgym.gymapi")
    gymtorch = types.ModuleType("isaacgym.gymtorch")
    gymutil = types.ModuleType("isaacgym.gymutil")
    pkg.torch_utils = tu
    pkg.gymapi = gymapi
    pkg.gymtorch = gymtorch
    pkg.gymutil = gymutil
    sys.modules["isaacgym"] = pkg
    sys.modules["isaacgym.torch_utils"] = tu
    sys.modules["isaacgym.gymapi"] = gymapi
    sys.modules["isaacgym.gymtorch"] = gymtorch
    sys.modules["isaacgym.gymutil"] = gymutil


def _install_fake_easydict():
    # easydict isn't installed; the reference only uses EasyDict as an
    # attribute-access dict.
    if "easydict" in sys.modules:
        return
    mod = types.ModuleType("easydict")

    class EasyDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    mod.EasyDict = EasyDict
    sys.modules["easydict"] = mod


def install() -> None:
    """Make `import phc.utils.torch_utils` / poselib imports work."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _install_fake_isaacgym()
    _install_fake_easydict()


# --------------------------------------------------------------------------- #
# kernel extraction
# --------------------------------------------------------------------------- #

def load_ref_torch_utils():
    install()
    import phc.utils.torch_utils as ref_tu  # noqa

    return ref_tu


def extract_kernels(rel_path: str, names: list[str]) -> dict:
    """AST-extract top-level functions `names` from a reference source file
    and exec them (decorators stripped) in a namespace seeded with torch +
    the reference's own torch_utils + the isaacgym stubs above."""
    install()
    ref_tu = load_ref_torch_utils()
    src_path = f"{REFERENCE_ROOT}/{rel_path}"
    with open(src_path) as f:
        tree = ast.parse(f.read())

    wanted = set(names)
    ns = {
        "torch": torch,
        "np": __import__("numpy"),
        "torch_utils": ref_tu,
        # names the kernels pull from `from isaacgym.torch_utils import *`
        "quat_mul": quat_mul,
        "quat_conjugate": quat_conjugate,
        "quat_rotate": quat_rotate,
        "quat_apply": quat_apply,
        "quat_from_angle_axis": quat_from_angle_axis,
        "normalize": normalize,
        "normalize_angle": normalize_angle,
        "to_torch": to_torch,
        "my_quat_rotate": ref_tu.my_quat_rotate,
        "quat_to_tan_norm": ref_tu.quat_to_tan_norm,
        "calc_heading_quat": ref_tu.calc_heading_quat,
        "calc_heading_quat_inv": ref_tu.calc_heading_quat_inv,
    }
    # remove_base_rot is defined (untraced) in humanoid.py and re-imported
    # by the other env modules
    def remove_base_rot(quat):
        base_rot = quat_conjugate(torch.tensor([[0.5, 0.5, 0.5, 0.5]]).to(quat))
        return quat_mul(quat, base_rot.repeat(quat.shape[0], 1))

    ns["remove_base_rot"] = remove_base_rot

    # kernels in humanoid_amp.py / humanoid_im.py call dof_to_obs_smpl /
    # dof_to_obs imported from humanoid.py
    if not rel_path.endswith("/humanoid.py"):
        ns.update(
            extract_kernels(
                "phc/env/tasks/humanoid.py", ["dof_to_obs_smpl", "dof_to_obs"]
            )
        )

    out = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in wanted:
            node.decorator_list = []
            mod = ast.Module(body=[node], type_ignores=[])
            code = compile(ast.fix_missing_locations(mod), src_path, "exec")
            exec(code, ns)
            out[node.name] = ns[node.name]
    missing = wanted - set(out)
    if missing:
        raise KeyError(f"kernels not found in {rel_path}: {sorted(missing)}")
    return out
