// Shim: database-download declarations (types live in Parameters.h).
#ifndef SHIM_DOWNLOADDATABASE_H
#define SHIM_DOWNLOADDATABASE_H

#include "Parameters.h"

extern std::vector<DatabaseDownload> externalDownloads;
extern std::vector<KmerThreshold> externalThreshold;

#endif
