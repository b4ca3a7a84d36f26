"""Robot controller registry (reference ``robot_envs/__init__.py:5-22``)."""


def get_controller_class(robot_type):
    if not isinstance(robot_type, str):
        return robot_type   # custom controller class (tests, new robots)
    if robot_type == 'sawyer':
        from .sawyer.sawyer_impedance import SawyerImpedanceController
        return SawyerImpedanceController
    if robot_type == 'widowx':
        from .widowx.widowx_controller import WidowXController
        return WidowXController
    if robot_type == 'franka':
        from .franka.franka_impedance import FrankaImpedanceController
        return FrankaImpedanceController
    if robot_type == 'baxter':
        from .baxter.baxter_impedance import BaxterImpedanceController
        return BaxterImpedanceController
    if robot_type == 'kuka':
        from .kuka.kuka_impedance import KukaImpedanceController
        return KukaImpedanceController
    raise NotImplementedError('unknown robot type {}'.format(robot_type))
