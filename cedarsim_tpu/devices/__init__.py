from cedarsim_tpu.devices.base import DeviceModel
from cedarsim_tpu.devices.simple import (
    Resistor, Capacitor, Inductor, Diode,
    VSource, VSourcePWL, VSourcePULSE, VSourceSIN, VSourceEXP,
    ISource, ISourcePWL, ISourcePULSE, ISourceSIN, ISourceEXP,
    VCVS, VCCS, CCVS, CCCS, CoupledInductors, VSwitch, ISwitch, TLine,
    LTRALine,
    OpenCircuit, ShortCircuit, nonlinear_resistor,
    nonlinear_capacitor,
)
