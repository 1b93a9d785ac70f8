// Shim: unused include carried by MetabuliBase.cpp.
#ifndef SHIM_PREFILTERING_H
#define SHIM_PREFILTERING_H
#endif
